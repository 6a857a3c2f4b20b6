package graft.core

import java.io.Reader

/** Minimal streaming CSV record reader mirroring Go's `encoding/csv`
  * reader as the reference configures it: single-char delimiter,
  * `LazyQuotes = true` (converter/converter.go:192-194, :336-345).
  *
  * Used only for the driver-side header + sampling pass (reference pass 1,
  * converter/converter.go:185-239) and in tests — the full data pass is
  * Spark's CSV datasource. Reads O(1) memory; stops as soon as the caller
  * stops pulling records, so sampling a 100-row prefix of a 100 GB file
  * touches only the prefix.
  *
  * Lazy-quote semantics mirrored from Go csv.Reader.readRecord:
  *  - a quoted field ends at a `"` followed by the delimiter, newline or
  *    EOF; a doubled `""` is a literal quote; any other `"` is literal;
  *  - quotes inside an unquoted field are literal;
  *  - `\r\n` inside a quoted field is normalized to `\n`;
  *  - lines end at `\n` (a preceding `\r` is dropped).
  */
final class LazyCsv(in: Reader, delimiter: Char = ',') extends Iterator[Array[String]] {
  private var pushback: Int = -2 // -2 = none
  private var eof = false
  private var nextRec: Array[String] = _
  private var nextReady = false

  private def read(): Int =
    if (pushback != -2) { val c = pushback; pushback = -2; c }
    else in.read()
  private def unread(c: Int): Unit = pushback = c

  private def readRecord(): Array[String] = {
    var c = read()
    // skip empty lines (Go csv skips blank lines between records)
    while (c == '\n' || c == '\r') c = read()
    if (c == -1) { eof = true; return null }
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder
    var done = false
    var fieldStart = true
    var inQuotes = false
    while (!done) {
      if (fieldStart && c == '"') { inQuotes = true; fieldStart = false; c = read() }
      else if (inQuotes) {
        c match {
          case -1 => // EOF inside quotes: lazy mode emits what we have
            inQuotes = false; done = true
            fields += sb.toString
          case '"' =>
            val n = read()
            n match {
              case '"' => sb.append('"'); c = read()
              case d if d == delimiter =>
                fields += sb.toString; sb.setLength(0)
                inQuotes = false; fieldStart = true; c = read()
              case '\n' | -1 =>
                fields += sb.toString; done = true
              case '\r' =>
                val n2 = read()
                if (n2 == '\n' || n2 == -1) { fields += sb.toString; done = true }
                else { sb.append('"').append('\r'); unread(n2); c = read() }
              case other => // lazy quotes: bare quote is literal
                sb.append('"'); unread(other); c = read()
            }
          case '\r' =>
            val n = read()
            if (n == '\n') sb.append('\n') else { sb.append('\r'); unread(n) }
            c = read()
          case ch => sb.append(ch.toChar); c = read()
        }
      } else {
        c match {
          case -1 =>
            fields += sb.toString; done = true
          case '\n' =>
            fields += sb.toString; done = true
          case '\r' =>
            val n = read()
            if (n == '\n' || n == -1) { fields += sb.toString; done = true }
            else { sb.append('\r'); unread(n); c = read() }
          case d if d == delimiter =>
            fields += sb.toString; sb.setLength(0); fieldStart = true; c = read()
          case ch =>
            sb.append(ch.toChar); fieldStart = false; c = read()
        }
      }
    }
    fields.toArray
  }

  override def hasNext: Boolean = {
    if (nextReady) true
    else if (eof) false
    else {
      nextRec = readRecord()
      nextReady = nextRec != null
      nextReady
    }
  }

  override def next(): Array[String] = {
    if (!hasNext) throw new NoSuchElementException("end of CSV")
    nextReady = false
    nextRec
  }
}
