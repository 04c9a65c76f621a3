package graft.functions

import java.util.regex.Pattern
import PyText._

/** Text cleaning with stack-trace / error-log removal.
  *
  * Re-expresses the reference's `clean_text` (`transformer.py:30-90`)
  * exactly, including its quirks, because the golden corpus depends on them:
  *
  *  - a cross-line state machine drops error/stack-trace lines and their
  *    indented continuations; a non-empty line NOT starting with a space
  *    ends the block (and is kept);
  *  - kept lines are `\r`-stripped, trimmed, and joined by single spaces;
  *  - tabs -> spaces, runs of 2+ spaces collapse to one;
  *  - `{code...}` / `{noformat}` markers are removed AFTER the space
  *    collapse, so marker removal can legitimately leave a double space;
  *  - ci-hadoop job URLs are replaced by the `[CI_URL]` token.
  *
  * Patterns are compiled with UNICODE_CHARACTER_CLASS so `\w`/`\s`/`\d`
  * match CPython's Unicode-aware `re` classes. Python's `re.match` anchors
  * at the start of the string, which is Java's `Matcher.lookingAt`.
  *
  * Pure function of one string — used from a typed Dataset map (narrow,
  * no shuffle) or registered as a UDF; at very large scale it could become
  * a codegen'd Catalyst UnaryExpression, but the per-row cost is regex-bound
  * either way.
  */
object CleanText {
  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // transformer.py:58 — error-line starters (the final alternative is the
  // '»' guillemet, anchored by re.match semantics).
  private val errStart = Pattern.compile(
    "^\\[ERROR\\]|^Exception|^at\\s+[\\w.]+|^\\s+at\\s+[\\w.]+|^Caused by:|^\\s+\\.\\.\\.\\s+\\d+\\s+more|^java\\.|»",
    U)
  // transformer.py:59 — qualified exception/error class prefix.
  private val errClass =
    Pattern.compile("^\\s*\\w+(\\.\\w+)+(Exception|Error):", U)
  private val multiSpace = Pattern.compile(" {2,}")
  private val jiraMarkup = Pattern.compile("\\{code.*?\\}|\\{noformat\\}")
  private val ciUrl =
    Pattern.compile("https?://ci-hadoop\\.apache\\.org/job/\\S+", U)

  def apply(text: String): String = {
    if (text == null) return ""

    val lines = text.split("\n", -1)
    val joined = new java.lang.StringBuilder(text.length)
    var inErrorBlock = false
    var wrote = false
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      if (errStart.matcher(line).lookingAt() ||
          errClass.matcher(line).lookingAt()) {
        inErrorBlock = true
      } else {
        if (inErrorBlock && pyStrip(line).nonEmpty && !line.startsWith(" "))
          inErrorBlock = false
        if (!inErrorBlock) {
          val cleanLine = pyStrip(line.replace("\r", ""))
          if (cleanLine.nonEmpty) {
            if (wrote) joined.append(' ')
            joined.append(cleanLine)
            wrote = true
          }
        }
      }
      li += 1
    }

    var t = joined.toString.replace('\t', ' ')
    t = multiSpace.matcher(t).replaceAll(" ")
    t = jiraMarkup.matcher(t).replaceAll("")
    t = ciUrl.matcher(t).replaceAll("[CI_URL]")
    pyStrip(t)
  }
}
