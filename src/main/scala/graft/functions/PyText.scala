package graft.functions

/** Python-string-semantics helpers.
  *
  * The reference pipeline (see `/root/reference/transformer.py`) manipulates
  * text with CPython `str` semantics: `len`/slicing count code points (not
  * UTF-16 units) and `str.strip()` strips the Unicode whitespace set defined
  * by `str.isspace()`, which is wider than Java's `Character.isWhitespace`
  * (notably U+00A0, U+2007, U+202F, U+0085). These helpers reproduce that
  * behavior exactly so golden-output parity holds on non-ASCII Jira text.
  */
object PyText {

  /** Code-point length, matching Python `len(str)`. */
  def pyLen(s: String): Int = s.codePointCount(0, s.length)

  /** Code-point-based prefix slice, matching Python `s[:n]`. */
  def pySlicePrefix(s: String, n: Int): String = {
    if (n <= 0) return ""
    if (pyLen(s) <= n) return s
    s.substring(0, s.offsetByCodePoints(0, n))
  }

  /** Whitespace per Python `str.isspace()` (superset of Java's). */
  def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00A0' || c == '\u2007' ||
      c == '\u202F' || c == '\u0085'

  /** Matches Python `str.strip()` with no arguments. */
  def pyStrip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.lower()` ~ Java ROOT-locale lowercase. */
  def pyLower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)
}
