package graft.util

import java.util.regex.{Matcher, Pattern}

/** Text-level credential masking for anything the engine logs or echoes
  * (reference `utils/logging_handler.py:7-50` — the `FilterSensitiveData`
  * logging filter and its `SENSITIVE_KEYS_REG`): any `password` / `secret`
  * / `credential(s)` / `pass` / `key` / Kafka SSL password entry, quoted
  * in `'`, `"` or bare, is replaced with a `masked_cred: ******,` marker.
  * The three regexes and the replacement strings are the reference's
  * verbatim (non-greedy value match terminated by ", ", " ", "}" or end
  * of input) — pinned against `tests/unit/test_log_filter_sensitive_data
  * .py` by ReferenceLogMaskSpec.
  *
  * This complements [[graft.exec.EngineUsage.scrub]] (structural key
  * masking on the recorded acon): scrub protects the persisted usage
  * record, LogMask protects free-text log lines.
  */
object LogMask {

  private val SensitiveKeys =
    "kafka\\.ssl\\.keystore\\.password|kafka\\.ssl\\.truststore\\.password" +
      "|password|secret|credential|credentials|pass|key"

  /** (regex, replacement) rows, same order as SENSITIVE_KEYS_REG. */
  private val rules: Seq[(Pattern, String)] = Seq(
    // enclosed in ''
    Pattern.compile(s"'($SensitiveKeys)'[ ]*:[ ]*'.*?(, | |\\}|$$)") ->
      "'masked_cred': '******', ",
    // enclosed in ""
    Pattern.compile("\"(" + SensitiveKeys + ")\"[ ]*:[ ]*\".*?(, | |\\}|$)") ->
      "\"masked_cred\": \"******\", ",
    // bare keys
    Pattern.compile(s"($SensitiveKeys)[ ]*:[ ]*.*?(, | |\\}|$$)") ->
      "masked_cred: ******, ")

  /** Mask every sensitive entry in a log message. */
  def apply(msg: String): String =
    rules.foldLeft(msg) { case (m, (p, repl)) =>
      p.matcher(m).replaceAll(Matcher.quoteReplacement(repl))
    }
}
