package graft.algo

import graft.spec.TerminatorSpec

/** Notification terminator (reference `terminators/notifier.py` +
  * `notifiers/email_notifier.py`).
  *
  * Capability parity: template registry with `{{ var }}` rendering from
  * the spec's `args` (the reference renders Jinja templates the same
  * way), free-form `message`/`subject` specs, and an `on_failure` flag
  * that suppresses the notification on successful runs. The SMTP/Graph
  * delivery itself is external I/O, so the transport is pluggable (as
  * the RestApiWriter's is) and defaults to structured logging — a real
  * deployment installs an SMTP transport without touching the engine.
  */
object Notifier {

  final case class Notification(
      recipients: Seq[String], subject: String, message: String)

  /** Delivery backend; default logs. Tests/deployments swap it. */
  type Transport = Notification => Unit

  /** Built-in templates (reference `notification_templates.py`). */
  val Templates: Map[String, (String, String, Boolean)] = Map(
    // name -> (subject, message, on_failure)
    "failure_notification_email" -> (
      ("Service Failure",
        "Job {{ job_name }} has failed with the exception: {{ exception }}",
        true))
  )

  @volatile private var transport: Transport = n =>
    org.apache.log4j.Logger.getLogger(getClass)
      .info(s"notification to=${n.recipients.mkString(",")} subject=${n.subject} message=${n.message}")

  /** Install a delivery backend (returns the previous one). */
  def setTransport(t: Transport): Transport = {
    val prev = transport; transport = t; prev
  }

  /** `{{ var }}` substitution from args; unknown vars render empty, as a
    * missing Jinja variable does. */
  def render(template: String, args: Map[String, Any]): String =
    "\\{\\{\\s*([A-Za-z0-9_]+)\\s*\\}\\}".r.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(
        args.get(m.group(1)).map(String.valueOf).getOrElse("")))

  /** Build + send the notification for a `notify` terminator spec.
    *
    * @param failed whether the surrounding run failed (drives on_failure)
    */
  def notify(spec: TerminatorSpec, failed: Boolean = false): Unit = {
    val args = spec.args
    val (subjectT, messageT, onFailureOnly) =
      args.get("template").map(String.valueOf) match {
        case Some(name) =>
          Templates.getOrElse(name,
            throw new IllegalArgumentException(s"unknown notification template: $name"))
        case None =>
          (args.get("subject").map(String.valueOf).getOrElse(""),
            args.get("message").map(String.valueOf).getOrElse(
              throw new IllegalArgumentException(
                "notify terminator needs a template or a message")),
            false)
      }
    if (!onFailureOnly || failed) {
      val recipients = args.get("to") match {
        case Some(s: Seq[_]) => s.map(String.valueOf)
        case Some(other) => Seq(String.valueOf(other))
        case None => Seq.empty
      }
      transport(Notification(recipients,
        render(subjectT, args), render(messageT, args)))
    }
  }
}
