package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Test-only xlsx writer (JDK zip + hand-built XML): produces a valid
  * minimal workbook so SourcesSpec can prove the from-scratch reader
  * end-to-end without any connector. Deliberately exercises all cell
  * encodings the reader supports: shared strings (header + string
  * columns), plain number cells (int/long/double), inline strings
  * (timestamps as `java.sql.Timestamp.toString`, the reader's
  * ISO-parse path), booleans (`t="b"`), and omitted cells for nulls. */
object XlsxTestWriter {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colName(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val data = df.collect()
    val sst = mutable.LinkedHashMap.empty[String, Int]
    def sstIdx(s: String): Int = sst.getOrElseUpdate(s, sst.size)

    val sheet = new StringBuilder
    sheet.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sheet.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def cellRef(r: Int, c: Int) = s"${colName(c)}$r"
    // header row (shared strings)
    sheet.append(s"""<row r="1">""")
    schema.fields.zipWithIndex.foreach { case (f, c) =>
      sheet.append(s"""<c r="${cellRef(1, c)}" t="s"><v>${sstIdx(f.name)}</v></c>""")
    }
    sheet.append("</row>")
    data.zipWithIndex.foreach { case (row, i) =>
      val r = i + 2
      sheet.append(s"""<row r="$r">""")
      schema.indices.foreach { c =>
        if (!row.isNullAt(c)) row.get(c) match {
          case s: String =>
            sheet.append(s"""<c r="${cellRef(r, c)}" t="s"><v>${sstIdx(s)}</v></c>""")
          case b: Boolean =>
            sheet.append(s"""<c r="${cellRef(r, c)}" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case t: java.sql.Timestamp =>
            // UTC ISO text — the reader parses ISO strings as UTC, so
            // roundtrip identity must not depend on the JVM zone
            val iso = java.time.LocalDateTime
              .ofInstant(t.toInstant, java.time.ZoneOffset.UTC).toString
            sheet.append(s"""<c r="${cellRef(r, c)}" t="inlineStr"><is><t xml:space="preserve">${esc(iso)}</t></is></c>""")
          case d: java.sql.Date =>
            sheet.append(s"""<c r="${cellRef(r, c)}" t="inlineStr"><is><t>${esc(d.toString)}</t></is></c>""")
          case n @ (_: Int | _: Long | _: Double | _: Float | _: java.math.BigDecimal) =>
            sheet.append(s"""<c r="${cellRef(r, c)}"><v>$n</v></c>""")
          case other =>
            sys.error(s"XlsxTestWriter: unsupported value $other")
        }
      }
      sheet.append("</row>")
    }
    sheet.append("</sheetData></worksheet>")

    val sstXml = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append(s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${sst.size}" uniqueCount="${sst.size}">""")
      sst.keysIterator.foreach(s => sb.append(s"""<si><t xml:space="preserve">${esc(s)}</t></si>"""))
      sb.append("</sst>")
      sb.toString
    }

    val contentTypes = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""
    val rootRels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    val workbook = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""
    val workbookRels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", workbookRels)
      put("xl/sharedStrings.xml", sstXml)
      put("xl/worksheets/sheet1.xml", sheet.toString)
    } finally zos.close()
  }
}
