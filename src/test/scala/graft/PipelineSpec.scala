package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Load, Pipeline}

/** End-to-end pipeline + sink tests (ref: etl.py:390-413, 264-386). */
class PipelineSpec extends SparkSpec {

  test("run(): five tables, sane cardinalities, csv+parquet+sqlite written") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val counts = Pipeline.run(spark, sfDir, out)
    assert(counts.keySet === Set("transactions", "customer_summary",
      "product_summary", "daily_sales", "country_summary"))
    assert(counts("transactions") === 6000L)
    assert(counts("customer_summary") === 150L)
    assert(counts("country_summary") === 25L)
    // parquet roundtrip preserves values
    val rt = spark.read.parquet(s"$out/parquet/country_summary")
    assert(rt.count() === 25L)
    // csv written with header
    val csv = spark.read.option("header", "true").csv(s"$out/csv/country_summary")
    assert(csv.count() === 25L && csv.columns.contains("TotalRevenue"))
    // run()'s default format list is the reference's csv/parquet/sqlite
    // (etl.py:367) — the zero-config embedded warehouse must land too
    val wh = Load.embeddedSink(out)
    val sq = spark.read.jdbc(wh.url, "country_summary", wh.props)
    assert(sq.count() === 25L && sq.columns.contains("TotalRevenue"))
  }

  test("sqlSinkShape: lowercase names + bround half-even (⚠R, etl.py:328,356)") {
    import spark.implicits._
    val df = Seq((1, 2.675, 2.665)).toDF("Id", "A", "B")
    val shaped = Load.sqlSinkShape(df, roundDoubles = true)
    assert(shaped.columns.toSeq === Seq("id", "a", "b"))
    val r = shaped.head()
    // bround is HALF_EVEN on the shortest decimal representation
    assert(r.getDouble(1) === 2.68) // 2.675 -> .675 rounds to even .68
    assert(r.getDouble(2) === 2.66) // 2.665 -> rounds to even .66
  }

  test("JDBC warehouse sink e2e on embedded Derby (S4-S6, etl.py:292-362)") {
    // Derby ships in /opt/spark/jars, so the writeJdbc path runs for
    // real here: all five tables out through mode(overwrite) JDBC with
    // the reference's SQL-sink shape, then read back and compared.
    val dbDir = Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dbDir/wh;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val tables = Pipeline.transform(spark, sfDir)
    Load.writeJdbc(tables, url, props, roundDoubles = true)
    tables.foreach { case (name, df) =>
      val shaped = Load.sqlSinkShape(df, roundDoubles = true)
      val back = spark.read.jdbc(url, name, props)
      assert(back.count() === df.count(), s"$name JDBC roundtrip count")
      assert(back.columns.toSeq === shaped.columns.toSeq, s"$name JDBC columns")
    }
    // exact value roundtrip on the smallest table
    val shaped = Load.sqlSinkShape(tables("country_summary"), roundDoubles = true)
    val got = spark.read.jdbc(url, "country_summary", props)
      .orderBy("country").collect().map(_.toSeq)
    val want = shaped.orderBy("country").collect().map(_.toSeq)
    assert(got.length === 25 && got.toSeq === want.toSeq)
    // overwrite mode really replaces (run twice, same counts)
    Load.writeJdbc(Map("country_summary" -> tables("country_summary")), url, props)
    assert(spark.read.jdbc(url, "country_summary", props).count() === 25L)
  }

  test("load() dispatches the reference's full format-string list incl. SQL sinks (S7, etl.py:364-386)") {
    // the reference's default list is ['csv','parquet','sqlite']
    // (etl.py:368); each SQL format maps to writeJdbc with its own
    // shaping — sqlite keeps column case, mysql rounds doubles
    val out = Files.createTempDirectory("graft_dispatch").toString
    val dbDir = Files.createTempDirectory("graft_derby_dispatch").toString
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    def sink(db: String) =
      Load.JdbcSink(s"jdbc:derby:$dbDir/$db;create=true", props)
    val tables = Map("country_summary" ->
      Pipeline.transform(spark, sfDir)("country_summary"))
    Load.load(tables, out,
      formats = Seq("csv", "parquet", "sqlite", "postgres", "mysql"),
      sqlite = Some(sink("sq")), postgres = Some(sink("pg")),
      mysql = Some(sink("my")))
    assert(spark.read.parquet(s"$out/parquet/country_summary").count() === 25L)
    assert(spark.read.option("header", "true").csv(s"$out/csv/country_summary").count() === 25L)
    // sqlite shape: ORIGINAL column case (etl.py:292-303 does not lowercase)
    val sq = spark.read.jdbc(sink("sq").url, "country_summary", props)
    assert(sq.columns.contains("TotalRevenue"), s"sqlite shape lost case: ${sq.columns.toSeq}")
    // postgres shape: lowercased, values unrounded
    val pg = spark.read.jdbc(sink("pg").url, "country_summary", props)
    assert(pg.columns.contains("totalrevenue"))
    // mysql shape: lowercased AND doubles bround(2)
    val my = spark.read.jdbc(sink("my").url, "country_summary", props)
    val wantMy = Load.sqlSinkShape(tables("country_summary"), roundDoubles = true)
    assert(my.orderBy("country").collect().map(_.toSeq).toSeq ===
      wantMy.orderBy("country").collect().map(_.toSeq).toSeq)
    assert(pg.count() === 25L && sq.count() === 25L)
    // the reference's DEFAULT call shape is zero-config (etl.py:367:
    // formats = ['csv','parquet','sqlite'], load_to_sqlite derives its
    // db from output_dir) — load(tables, outDir) mirrors it, landing
    // the embedded warehouse at outDir/sales_data.db
    val out2 = Files.createTempDirectory("graft_dispatch_default").toString
    Load.load(tables, out2)
    assert(spark.read.parquet(s"$out2/parquet/country_summary").count() === 25L)
    val defSink = Load.embeddedSink(out2)
    val sq2 = spark.read.jdbc(defSink.url, "country_summary", defSink.props)
    assert(sq2.count() === 25L && sq2.columns.contains("TotalRevenue"))
    // postgres/mysql without their endpoint still fail loudly, like
    // the reference requiring pg_config for postgres
    val e = intercept[IllegalArgumentException] {
      Load.load(tables, out, formats = Seq("postgres"))
    }
    assert(e.getMessage.contains("postgres"))
  }

  test("partitioned parquet write enables partition pruning layout") {
    val out = Files.createTempDirectory("graft_part").toString
    val daily = Pipeline.transform(spark, sfDir)("daily_sales")
      .withColumn("year", year(col("Date")))
    Load.writeParquetPartitioned(daily, out, Seq("year"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("year=")))
    val filtered = spark.read.parquet(out).filter(col("year") === 1995)
    assert(filtered.count() > 0)
    // the filter must prune at the file index, not post-scan: the scan
    // carries a `year` partition filter and lists exactly one of the
    // written partitions
    val scans = filtered.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.toString.contains("year")),
        s"filter did not reach the partition index: ${f.partitionFilters}")
      val read = f.relation.location.listFiles(f.partitionFilters, f.dataFilters).length
      val all = f.relation.location.listFiles(Nil, Nil).length
      assert(read === 1, s"scan lists $read partitions for a single-year filter")
      assert(all === dirs.count(_.startsWith("year=")))
    }
  }

  test("compacted parquet write sizes file count from the plan estimate") {
    def dataFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    val df = graft.etl.Tables.lineitem(spark, sfDir)
      .repartition(16) // a fragmented parent: 16 tasks = 16 tiny files
    // big target → everything compacts into ONE file
    val out1 = Files.createTempDirectory("graft_compact1").toString
    assert(Load.writeCompacted(df, out1, targetMB = 1024) === 1)
    assert(dataFiles(out1).length === 1)
    // tiny target → more, evenly-sized files (round-robin, no skew);
    // sf0.1: a ~10 MB input, so a 1 MB target must split ~10 ways
    val big = graft.etl.Tables.lineitem(spark, "/root/testdata/sf0.1").repartition(16)
    val out2 = Files.createTempDirectory("graft_compact2").toString
    val n = Load.writeCompacted(big, out2, targetMB = 1)
    assert(n > 1, s"1MB target should split this table, chose $n")
    val files = dataFiles(out2)
    assert(files.length === n)
    val sizes = files.map(_.length())
    assert(sizes.max <= sizes.min * 3,
      s"round-robin output should be even: ${sizes.mkString(",")}")
    // values survive the rewrite
    assert(spark.read.parquet(out2).count() ===
      graft.etl.Tables.lineitem(spark, "/root/testdata/sf0.1").count())
  }
}
