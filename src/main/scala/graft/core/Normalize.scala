package graft.core

/** Header normalization, mirroring the cleanup loop in `detectSchema`
  * (converter/converter.go:201-211): strip a UTF-8 BOM prefix, trim
  * whitespace, replace ' ' and '.' with '_', and name empty headers
  * `column_<i>` (0-based).
  */
object Normalize {

  /** The BOM bytes EF BB BF decode to U+FEFF when the file is read as
    * UTF-8 text (the Go code strips the raw bytes; on the JVM the stream
    * has already been decoded). */
  private final val Bom = "\uFEFF"

  def header(raw: String, index: Int): String = {
    var h = if (raw == null) "" else raw
    if (h.startsWith(Bom)) h = h.substring(1)
    h = GoParse.trimSpace(h).replace(' ', '_').replace('.', '_')
    if (h.isEmpty) s"column_$index" else h
  }

  def headers(raw: Seq[String]): Seq[String] =
    raw.zipWithIndex.map { case (h, i) => header(h, i) }
}
