package graft.util

/**
 * Hive partition-path value escaping. Hive's scheme is %XX-only: a small
 * set of special characters is written as `%XX`, everything else is
 * literal — notably `+` stays `+` (URL form-decoding would turn it into
 * a space) and a `%` not followed by two hex digits is literal, not an
 * error. Equivalent of Spark's `ExternalCatalogUtils.unescapePathName`
 * (the reference leans on Hudi's `FSUtils` for the same parse — ref
 * `core/.../hudi/HudiPartitionValuesExtractor.java:47-70`).
 */
object PathCodec {

  private val NeedsEscape: Set[Char] =
    ((0 until 32).map(_.toChar) ++ "\u007F\"#%'*/:=?\\{[]^").toSet

  /** Decode `input_file_name()`'s URL-ENCODED URI back to the raw
    * on-disk path: Spark reports "part=a%20b" for the on-disk dir
    * "part=a b" (and "pct%252525" for on-disk "pct%2525"), while Hadoop
    * Path treats strings as raw and never percent-decodes — the two
    * forms only meet through a real java.net.URI parse. */
  def decodeFileUri(f: String): String =
    try new java.net.URI(f).getPath
    catch { case _: Exception => new org.apache.hadoop.fs.Path(f).toUri.getPath }

  def escapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      if (NeedsEscape.contains(c)) sb.append(f"%%${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // literal '%' unless followed by exactly two hex digits
      if (c == '%' && i + 2 <= s.length - 1) {
        val h1 = Character.digit(s.charAt(i + 1), 16)
        val h2 = Character.digit(s.charAt(i + 2), 16)
        if (h1 >= 0 && h2 >= 0) {
          sb.append(((h1 << 4) + h2).toChar)
          i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
