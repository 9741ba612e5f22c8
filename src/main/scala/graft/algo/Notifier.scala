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
    * Failure-notification gating follows the reference
    * (`terminators/terminator_factory.py:44-47` + `notifier.py:70-98`):
    * a notify spec is a FAILURE notification by DEFAULT (`on_failure`
    * defaults to true, template-backed or free-form), so terminate-time
    * dispatch (failed = false) skips it; only `on_failure: false` specs
    * fire on success.
    *
    * @param failed whether the surrounding run failed
    */
  def notify(spec: TerminatorSpec, failed: Boolean = false): Unit = {
    if (NotifierFactory.checkIfNotificationIsFailureNotification(spec) && !failed)
      return
    val args = spec.args
    val (subjectT, messageT) =
      args.get("template").map(String.valueOf) match {
        case Some(name) =>
          val (s, m, _) = Templates.getOrElse(name,
            throw new IllegalArgumentException(s"unknown notification template: $name"))
          (s, m)
        case None =>
          (args.get("subject").map(String.valueOf).getOrElse(""),
            args.get("message").map(String.valueOf).getOrElse(
              throw new IllegalArgumentException(
                "notify terminator needs a template or a message")))
      }
    val recipients = args.get("to") match {
      case Some(s: Seq[_]) => s.map(String.valueOf)
      case Some(other) => Seq(String.valueOf(other))
      case None => Seq.empty
    }
    transport(Notification(recipients,
      render(subjectT, args), render(messageT, args)))
  }
}

/** `NotifierFactory` (`terminators/notifier_factory.py:12-70`) +
  * `Notifier.check_if_notification_is_failure_notification`
  * (`terminators/notifier.py:70-98`): notifier-type dispatch with the
  * reference's exact error message, failure-notification classification
  * (on_failure defaults TRUE — free-form and template specs alike), and
  * failure-notification generation from terminate specs on a failed run.
  * Pinned verbatim by ReferenceNotifierFactorySpec against
  * `tests/unit/test_notification_factory.py` /
  * `test_failure_notification_creation.py`. */
object NotifierFactory {

  final case class NotifierNotFoundException(msg: String) extends RuntimeException(msg)

  /** A constructed notifier: `create_notification` then
    * `send_notification` (the reference's two-step protocol). */
  final class Handle(val tpe: String, initialArgs: Map[String, Any]) {
    private var built: Map[String, Any] = initialArgs
    def createNotification(): Map[String, Any] = {
      built = EmailNotifier.createNotification(initialArgs); built
    }
    def notification: Map[String, Any] = built
    def sendNotification(): Unit = EmailNotifier.sendNotification(built)
  }

  private val NotifierTypes = Set("email")

  /** `get_notifier`: type dispatch, message verbatim. */
  def getNotifier(spec: TerminatorSpec): Handle = {
    val name = spec.args.get("type").map(String.valueOf).orNull
    if (name != null && NotifierTypes.contains(name)) new Handle(name, spec.args)
    else throw NotifierNotFoundException(
      s"The requested notification format $name is not supported.")
  }

  /** `check_if_notification_is_failure_notification`: template-backed
    * specs consult the template registry (unknown template raises the
    * reference's ValueError text); either way `on_failure` DEFAULTS to
    * true. */
  def checkIfNotificationIsFailureNotification(spec: TerminatorSpec): Boolean = {
    val args = spec.args
    def onFailure = args.get("on_failure") match {
      case Some(b: Boolean) => b
      case Some(other) => String.valueOf(other).equalsIgnoreCase("true")
      case None => true
    }
    args.get("template").map(String.valueOf) match {
      case Some(name) =>
        if (EmailNotifier.Templates.contains(name)) onFailure
        else throw new IllegalArgumentException(s"Template $name not found.")
      case None => onFailure
    }
  }

  /** `generate_failure_notification`: on a failed run, every notify
    * terminate spec that opted in (generate_failure_notification) or
    * classifies as a failure notification is built with the exception
    * text and sent. */
  def generateFailureNotification(
      specs: Seq[TerminatorSpec], exception: Throwable): Unit =
    specs.filter(_.function == "notify").foreach { t =>
      val generate = t.args.get("generate_failure_notification").contains(true)
      if (generate || checkIfNotificationIsFailureNotification(t)) {
        var args = t.args + ("exception" ->
          Option(exception.getMessage).getOrElse(exception.toString))
        if (generate)
          args += ("template" ->
            s"failure_notification_${args.get("type").map(String.valueOf).getOrElse("")}")
        val notifier = getNotifier(TerminatorSpec("notification", args))
        notifier.createNotification()
        notifier.sendNotification()
      }
    }
}

/** Verbatim email notifier (reference `terminators/notifiers/
  * email_notifier.py:24-185`, `notifier.py:44-67`,
  * `notification_templates.py`): template registry with the reference's
  * exact failure template, notification creation/validation with the
  * reference's exception types and messages, a disallowed-server guard
  * driven by engine configuration, a Python-email-compatible MIME
  * renderer and a minimal SMTP client (EHLO, tolerated STARTTLS/AUTH
  * refusal — mirroring the reference's try/except around
  * starttls+login — MAIL/RCPT/DATA).
  *
  * Graph-API (office365) delivery is a documented environment ceiling:
  * no msgraph SDK in the build; those servers raise a clear error.
  */
object EmailNotifier {

  final case class NotifierConfigException(msg: String) extends RuntimeException(msg)
  final case class NotifierTemplateNotFoundException(msg: String)
    extends RuntimeException(msg)
  final case class NotifierTemplateConfigException(msg: String)
    extends RuntimeException(msg)

  /** EMAIL_NOTIFICATIONS_TEMPLATES — text matches the reference's
    * rendering byte for byte. */
  val Templates: Map[String, Map[String, Any]] = Map(
    "failure_notification_email" -> Map(
      "subject" -> "Service Failure",
      "mimetype" -> "text/text",
      "message" -> ("\n            Job {{ databricks_job_name }} in workspace " +
        "{{ databricks_workspace_id }} has\n            failed with the " +
        "exception: {{ exception }}"),
      "on_failure" -> true))

  /** Outside Databricks the job context resolves to (workspace, job) =
    * ("local", "local") — the reference patches
    * `DatabricksUtils.get_databricks_job_information` to exactly this in
    * its local test environment. Swap for a real provider on Databricks. */
  @volatile var jobInformation: () => (String, String) = () => ("local", "local")

  /** `_render_notification_field`: only the databricks job fields and the
    * run exception substitute; anything else renders empty. */
  def renderField(field: String, args: Map[String, Any]): String = {
    val needsContext = field.contains("databricks_job_name") ||
      field.contains("databricks_workspace_id") || field.contains("exception")
    val vars: Map[String, Any] =
      if (needsContext) {
        val (workspaceId, jobName) = jobInformation()
        Map("databricks_job_name" -> jobName,
          "databricks_workspace_id" -> workspaceId,
          "exception" -> args.getOrElse("exception", ""))
      } else Map.empty
    Notifier.render(field, vars)
  }

  /** `create_notification`: template lookup or free-form message, both
    * rendered; returns the updated notification map (the reference
    * mutates `self.notification` in place). */
  def createNotification(args: Map[String, Any]): Map[String, Any] =
    args.get("template").map(String.valueOf) match {
      case Some(name) =>
        Templates.get(name) match {
          case Some(t) =>
            args +
              ("message" -> renderField(String.valueOf(t("message")), args)) +
              ("subject" -> renderField(String.valueOf(t("subject")), args)) +
              ("mimetype" -> t("mimetype"))
          case None =>
            throw NotifierTemplateNotFoundException(s"Template $name does not exist")
        }
      case None if args.contains("message") =>
        args +
          ("message" -> renderField(String.valueOf(args("message")), args)) +
          ("subject" -> renderField(String.valueOf(args.getOrElse("subject", "")), args))
      case None =>
        throw NotifierConfigException("Malformed Notification Definition")
    }

  private def strSeq(args: Map[String, Any], k: String): Seq[String] =
    args.get(k) match {
      case Some(s: Seq[_]) => s.map(String.valueOf(_))
      case Some(other) => Seq(String.valueOf(other))
      case None => Seq.empty
    }

  /** Engine-config disallowed servers
    * (`configs/engine.yaml: notif_disallowed_email_servers`): a session
    * conf override wins; otherwise [[graft.exec.EngineConfig]] (the
    * dict/file/package-overridable engine configuration). */
  def disallowedServers: Seq[String] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption("spark.graft.notifDisallowedEmailServers"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.exec.EngineConfig.get.notifDisallowedEmailServers)

  /** `send_notification`: validation, disallowed-server guard, transport
    * selection. */
  def sendNotification(notification: Map[String, Any]): Unit = {
    validate(notification)
    val server = String.valueOf(notification("server"))
    val officeServers = Seq("smtp.office365.com")
    val disallowed = disallowedServers
    if (disallowed.contains(server))
      throw NotifierConfigException(
        s"Trying to use disallowed smtp server: '$server'.\n" +
          "Disallowed smtp servers: [" +
          disallowed.map(s => s"'$s'").mkString(", ") + "]")
    else if (officeServers.contains(server))
      throw NotifierConfigException(
        "office365 Graph delivery needs the msgraph SDK, absent from this build")
    else
      sendSimpleSmtp(notification)
  }

  /** `_validate_email_notification`. */
  private def validate(n: Map[String, Any]): Unit = {
    def empty(k: String) = !n.get(k).exists(v => String.valueOf(v).nonEmpty)
    if (empty("from"))
      throw NotifierConfigException("Email notification must contain 'from' field.")
    if (empty("server"))
      throw NotifierConfigException("Email notification must contain 'server' field.")
    if (empty("port"))
      throw NotifierConfigException("Email notification must contain 'port' field.")
    if (strSeq(n, "to").isEmpty && strSeq(n, "cc").isEmpty && strSeq(n, "bcc").isEmpty)
      throw NotifierConfigException(
        "No recipients provided. Please provide at least one recipient.")
  }

  /** Python-email-compatible multipart rendering: the exact header and
    * body shapes `email.mime` produces (the reference's consumers parse
    * these with positional regexes). */
  def renderMime(n: Map[String, Any]): String = {
    val boundary = "===============graft0314=="
    val subtype = String.valueOf(n.getOrElse("mimetype", "plain")) match {
      case "html" | "text/html" => "html"
      case "text" | "text/plain" | "plain" | "text/text" => "text"
      case _ => "text"
    }
    val sb = new StringBuilder
    sb.append(s"""Content-Type: multipart/mixed; boundary="$boundary"""").append('\n')
    sb.append("MIME-Version: 1.0").append('\n')
    sb.append(s"From: ${n("from")}").append('\n')
    sb.append(s"To: ${strSeq(n, "to").mkString(", ")}").append('\n')
    sb.append(s"CC: ${strSeq(n, "cc").mkString(", ")}").append('\n')
    sb.append(s"BCC: ${strSeq(n, "bcc").mkString(", ")}").append('\n')
    sb.append(s"Subject: ${n.getOrElse("subject", "")}").append('\n')
    sb.append(s"Importance: ${n.getOrElse("importance", "normal")}").append('\n')
    sb.append('\n')
    sb.append(s"--$boundary").append('\n')
    sb.append(s"""Content-Type: text/$subtype; charset="us-ascii"""").append('\n')
    sb.append("MIME-Version: 1.0").append('\n')
    sb.append("Content-Transfer-Encoding: 7bit").append('\n')
    sb.append('\n')
    sb.append(String.valueOf(n.getOrElse("message", ""))).append('\n')
    strSeq(n, "attachments").foreach { f =>
      val name = f.split("/").last
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      val b64 = java.util.Base64.getEncoder.encodeToString(bytes)
        .grouped(76).mkString("\n")
      sb.append(s"--$boundary").append('\n')
      sb.append(s"""Content-Type: application/octet-stream; Name="$name"""").append('\n')
      sb.append("MIME-Version: 1.0").append('\n')
      sb.append("Content-Transfer-Encoding: base64").append('\n')
      sb.append(s"""Content-Disposition: attachment; filename="$name"""").append('\n')
      sb.append('\n')
      sb.append(b64).append('\n')
    }
    sb.append(s"--$boundary--").append('\n')
    sb.toString
  }

  // ------------------------------------------------------------------
  // Graph-API (office365) email body (`email_notifier.py:229-313`
  // `_create_graph_api_email_body` / `_set_graph_api_recipients`): the
  // structured sendMail request the msgraph SDK would serialize —
  // recipients, typed body, raw-byte file attachments (base64 happens
  // only at the wire). Pinned by ReferenceNotifierFactorySpec against
  // `tests/unit/test_notification_creation.py`
  // test_office365_notification_creation.
  // ------------------------------------------------------------------

  final case class GraphRecipient(address: String)
  final case class GraphAttachment(name: String, size: Int, contentBytes: Array[Byte])
  final case class GraphItemBody(contentType: String, content: String)
  final case class GraphMessage(
      subject: String,
      body: GraphItemBody,
      toRecipients: Seq[GraphRecipient],
      ccRecipients: Seq[GraphRecipient],
      bccRecipients: Seq[GraphRecipient],
      attachments: Seq[GraphAttachment],
      importance: String)
  final case class GraphEmailBody(message: GraphMessage, saveToSentItems: Boolean)

  def createGraphApiEmailBody(n: Map[String, Any]): GraphEmailBody = {
    def recipients(k: String): Seq[GraphRecipient] =
      strSeq(n, k).map(GraphRecipient)
    val contentType = String.valueOf(n.getOrElse("mimetype", "plain")) match {
      case "html" | "text/html" => "html"
      case _ => "text"
    }
    val attachments = strSeq(n, "attachments").map { f =>
      val name = f.split("/").last
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f))
      GraphAttachment(name, bytes.length, bytes)
    }
    GraphEmailBody(
      GraphMessage(
        subject = String.valueOf(n.getOrElse("subject", "")),
        body = GraphItemBody(contentType, String.valueOf(n.getOrElse("message", ""))),
        toRecipients = recipients("to"),
        ccRecipients = recipients("cc"),
        bccRecipients = recipients("bcc"),
        attachments = attachments,
        importance = String.valueOf(n.getOrElse("importance", "normal"))),
      saveToSentItems = false)
  }

  /** `_authenticate_and_send_simple_smtp`: plain-socket SMTP with the
    * reference's tolerance — STARTTLS/AUTH refusal is logged and the
    * send proceeds unauthenticated. */
  private def sendSimpleSmtp(n: Map[String, Any]): Unit = {
    val server = String.valueOf(n("server"))
    val port = String.valueOf(n("port")).toInt
    val rcpts = strSeq(n, "to") ++ strSeq(n, "cc") ++ strSeq(n, "bcc")
    val data = renderMime(n)
    val sock = new java.net.Socket(server, port)
    try {
      sock.setSoTimeout(15000)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8")
      def reply(): String = {
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        first
      }
      def cmd(c: String): String = { out.write(c + "\r\n"); out.flush(); reply() }
      reply() // 220 greeting
      cmd("EHLO localhost")
      val tls = cmd("STARTTLS")
      if (!tls.startsWith("2") && !tls.startsWith("3"))
        log.info("smtp server refused STARTTLS; sending without TLS")
      val auth = cmd("AUTH LOGIN")
      if (!auth.startsWith("3"))
        log.info("smtp server refused AUTH; sending without authentication")
      cmd(s"MAIL FROM:<${n("from")}>")
      rcpts.foreach(r => cmd(s"RCPT TO:<$r>"))
      cmd("DATA") // 354
      // dot-stuff per RFC 5321 §4.5.2
      val stuffed = data.split("\n", -1).map(l =>
        if (l.startsWith(".")) "." + l else l).mkString("\r\n")
      out.write(stuffed + "\r\n.\r\n"); out.flush()
      reply() // 250
      cmd("QUIT")
    } finally sock.close()
  }

  private val log = org.apache.log4j.Logger.getLogger(getClass)
}
