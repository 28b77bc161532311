package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Minimal from-scratch `.xlsx` reader — JDK only (java.util.zip +
  * StAX), no connector jar, closing SURVEY.md §2.1 S1 in this
  * zero-egress image (ref: data/etl.py:44-54 reads the workbook with
  * `pd.read_excel`).
  *
  * An xlsx file is a zip of XML parts. This reader consumes exactly
  * the parts a data table needs:
  *   - `xl/workbook.xml` + `xl/_rels/workbook.xml.rels` — resolve the
  *     FIRST sheet in workbook order (pandas' default sheet choice);
  *   - `xl/sharedStrings.xml` — the shared-string table (cells with
  *     `t="s"` store an index into it);
  *   - `xl/worksheets/sheetN.xml` — rows of `<c r="A1" t="...">`
  *     cells, streamed with StAX in O(1) memory per row.
  * Cell types handled: shared string (`t="s"`), inline string
  * (`t="inlineStr"`), formula-cached string (`t="str"`), boolean
  * (`t="b"`), and untyped numbers. Row 1 is the header (skipped —
  * the declared schema maps POSITIONALLY, same convention as the CSV
  * source with `header=true`). Missing/empty cells become nulls.
  *
  * Typed conversion follows the DECLARED schema (never inference):
  * numbers parse exactly; timestamps/dates accept either ISO strings
  * or Excel serial day numbers (days since 1899-12-30, fractional
  * part = time of day, rendered in UTC — Excel serials carry no zone).
  *
  * Scale: xlsx is an intrinsically non-splittable format (a zip
  * central directory + deflate streams) with a hard 1,048,576-row
  * sheet cap, so EVERY engine's Excel path is a single-reader parse.
  * Here that parse streams on the driver and the resulting rows are
  * `parallelize`d to executors; spreadsheets enter a 100 TB pipeline
  * only as small dimension/side inputs (the reference's own workload
  * shape) — the fact stream arrives as parquet/CSV, which do split. */
object Xlsx {

  /** Days between 1899-12-30 (Excel day 0) and 1970-01-01. */
  private val EpochOffsetDays = 25569L

  def rows(path: String, schema: StructType): Seq[Row] = {
    val zip = new ZipFile(path)
    try {
      val sst = sharedStrings(zip)
      parseSheet(zip, firstSheetName(zip), sst, schema)
    } finally zip.close()
  }

  private def newReader(zip: ZipFile, entry: String) = {
    val e = zip.getEntry(entry)
    require(e != null, s"xlsx is missing required part: $entry")
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    // the zip payload is local and self-contained; never fetch DTDs
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.createXMLStreamReader(zip.getInputStream(e))
  }

  /** First sheet in workbook order, resolved through the workbook
    * relationships part (not by filename guessing). */
  private def firstSheetName(zip: ZipFile): String = {
    val rels = mutable.Map.empty[String, String]
    val rr = newReader(zip, "xl/_rels/workbook.xml.rels")
    while (rr.hasNext) {
      if (rr.next() == XMLStreamConstants.START_ELEMENT &&
        rr.getLocalName == "Relationship")
        rels(rr.getAttributeValue(null, "Id")) =
          rr.getAttributeValue(null, "Target")
    }
    rr.close()
    var rid: String = null
    val wr = newReader(zip, "xl/workbook.xml")
    while (wr.hasNext && rid == null) {
      if (wr.next() == XMLStreamConstants.START_ELEMENT &&
        wr.getLocalName == "sheet")
        rid = (0 until wr.getAttributeCount)
          .find(i => wr.getAttributeLocalName(i) == "id")
          .map(wr.getAttributeValue).orNull
    }
    wr.close()
    require(rid != null, "xlsx workbook declares no sheets")
    val target = rels.getOrElse(rid, sys.error(s"unresolved sheet relationship $rid"))
    if (target.startsWith("/")) target.drop(1)
    else if (target.startsWith("xl/")) target
    else s"xl/$target"
  }

  /** Shared-string table (absent in workbooks with no string cells). */
  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inT = false
    val r = newReader(zip, "xl/sharedStrings.xml")
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        if (r.getLocalName == "si") sb.clear()
        else if (r.getLocalName == "t") inT = true
      case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        if (r.getLocalName == "t") inT = false
        else if (r.getLocalName == "si") out += sb.toString
      case _ => ()
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC12" → 0-based column index 54. */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  private def parseSheet(zip: ZipFile, sheetEntry: String,
                         sst: IndexedSeq[String], schema: StructType): Seq[Row] = {
    val out = mutable.ArrayBuffer.empty[Row]
    val cells = mutable.Map.empty[Int, Any]
    val sb = new StringBuilder
    var nRows = 0
    var colIdx = 0
    var nextAutoCol = 0
    var cellType: String = null
    var capture = false
    var isHeader = true
    val r = newReader(zip, sheetEntry)
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" =>
          cells.clear(); nextAutoCol = 0; isHeader = nRows == 0
        case "c" =>
          val ref = r.getAttributeValue(null, "r")
          colIdx = if (ref != null) colIndex(ref) else nextAutoCol
          nextAutoCol = colIdx + 1
          cellType = r.getAttributeValue(null, "t")
          sb.clear()
        case "v" | "t" => capture = true
        case _ => ()
      }
      case XMLStreamConstants.CHARACTERS if capture => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" | "t" => capture = false
        case "c" =>
          // header cells (row 1) are never converted — the declared
          // schema maps positionally, like CSV header=true
          if (!isHeader && colIdx < schema.length) {
            val ref = sb.toString.trim
            // a styled blank cell can be t="s" with an empty <v/> —
            // that's a null, not a shared-string lookup
            val raw =
              if (cellType == "s") { if (ref.isEmpty) "" else sst(ref.toInt) }
              else sb.toString
            val v = convert(raw, cellType, schema(colIdx).dataType)
            if (v != null) cells(colIdx) = v
          }
        case "row" =>
          nRows += 1
          if (nRows > 1) // row 1 = header; schema maps positionally
            out += Row.fromSeq(schema.indices.map(i => cells.get(i).orNull))
        case _ => ()
      }
      case _ => ()
    }
    r.close()
    out.toSeq
  }

  private def isNumeric(s: String): Boolean =
    s.nonEmpty && s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")

  private def serialToMillis(serial: Double): Long =
    math.round((serial - EpochOffsetDays) * 86400000.0)

  /** Raw cell text → the declared Spark type (null for blank cells). */
  private def convert(s: String, cellType: String, dt: DataType): Any = {
    if (s.isEmpty) return null
    dt match {
      case StringType => s
      case IntegerType => math.round(s.toDouble).toInt
      case LongType => if (s.matches("-?\\d+")) s.toLong else math.round(s.toDouble)
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s == "1" || s.equalsIgnoreCase("true")
      case TimestampType =>
        if (isNumeric(s)) new java.sql.Timestamp(serialToMillis(s.toDouble))
        else {
          // parse ISO strings AS UTC, explicitly: Timestamp.valueOf
          // would use the JVM default zone, silently diverging from
          // the Excel-serial branch (UTC by definition) and from the
          // CSV source (session timeZone, UTC here) on any non-UTC JVM
          val t = s.replace(' ', 'T')
          val ldt = java.time.LocalDateTime.parse(if (t.contains('T')) t else t + "T00:00")
          java.sql.Timestamp.from(ldt.toInstant(java.time.ZoneOffset.UTC))
        }
      case DateType =>
        if (isNumeric(s))
          java.sql.Date.valueOf(
            java.time.LocalDate.ofEpochDay(s.toDouble.toLong - EpochOffsetDays))
        else java.sql.Date.valueOf(s.take(10))
      case d: DecimalType =>
        // HALF_UP, matching the CSV source's tolerant parse (default
        // ROUND_UNNECESSARY would abort the file on extra digits)
        new java.math.BigDecimal(s).setScale(d.scale, java.math.RoundingMode.HALF_UP)
      case other =>
        sys.error(s"xlsx reader does not support declared type $other")
    }
  }
}
