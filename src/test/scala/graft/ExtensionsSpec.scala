package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make every native function SQL-callable on a
  * fresh session with no per-module register calls, with values
  * identical to the register() path. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-installed session evaluates all graft functions") {
    // getOrCreate returns any existing default session (ignoring
    // extensions), so clear the registries first; the builder then
    // creates a FRESH session with extensions applied, reusing the
    // JVM's SparkContext. Never stop() here — that would kill the
    // context shared with the other suites.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(defaultCpus = 2)
      .appName("graft-extensions-spec")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
          |  quantize_vec(array(CAST(0.5 AS FLOAT))) AS q,
          |  token_stats('the cat sat') AS ts,
          |  token_fingerprint('a b a') AS tf,
          |  token_shingles('a b c d') AS sh,
          |  simhash_bits('a b c') AS sb,
          |  zorder_long(array(3L, 3L)) AS z,
          |  rolling_chunks('short') AS rc,
          |  ahash_bands('some sample text body') AS ab,
          |  phash_bands('some sample text body') AS pb,
          |  audiofp_bands('some sample text body') AS fb
          |""".stripMargin).head()
      assert(r.getAs[Long]("d") === 32L)
      assert(r.getAs[Seq[Long]]("q") === Seq(5000L))
      assert(r.getAs[org.apache.spark.sql.Row]("ts").getAs[Int]("NTokens") === 3)
      assert(r.getAs[org.apache.spark.sql.Row]("tf")
        .getAs[String]("Fingerprint").length === 32)
      assert(r.getAs[Seq[String]]("sh") === Seq("a b c", "b c d"))
      assert(r.getAs[String]("sb").matches("[01]{8}"))
      assert(r.getAs[Long]("z") === 15L)
      // sub-window text = one whole-text chunk
      assert(r.getAs[Seq[String]]("rc").length === 1)
      Seq("ab", "pb", "fb").foreach { c =>
        val bands = r.getAs[scala.collection.Seq[Int]](c)
        assert(bands.length === 4, c)
        bands.foreach(v => assert(v >= 0 && v < (1 << 16), s"$c band $v"))
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("native expressions run inside whole-stage codegen (fallback disabled, compile errors fatal)") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(defaultCpus = 2)
      .appName("graft-codegen-spec")
      // a Janino compile failure in the generated code must THROW, not
      // silently degrade to interpreted execution
      .config("spark.sql.codegen.fallback", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // non-constant inputs so ConstantFolding cannot pre-evaluate the
      // expressions on the interpreted path
      val df = spark.range(64).selectExpr(
        "token_shingles(concat('alpha beta gamma delta ', CAST(id AS STRING))) AS sh",
        "simhash_bits(concat('w1 w2 w3 ', CAST(id AS STRING))) AS sb",
        "token_stats(concat('the quick fox ', CAST(id AS STRING))) AS ts",
        "token_fingerprint(concat('a b c ', CAST(id AS STRING))) AS tf",
        "quantize_vec(array(CAST(0.25 AS FLOAT), CAST(id AS FLOAT))) AS q",
        "zorder_long(array(id, id + 1L)) AS z",
        "rolling_chunks(concat('some chunkable text body ', CAST(id AS STRING))) AS rc",
        "ahash_bands(concat('hash me ', CAST(id AS STRING))) AS ab",
        "phash_bands(concat('hash me ', CAST(id AS STRING))) AS pb",
        "audiofp_bands(concat('hash me ', CAST(id AS STRING))) AS fb")
        .selectExpr("minhash_bands(sh) AS mb", "long_dot(q, q) AS dd",
          "sb", "ts", "tf", "z", "rc", "ab", "pb", "fb")
      val rows = df.collect()
      assert(rows.length === 64)
      assert(rows.forall(_.getAs[Seq[String]]("mb").length === 4))
      assert(rows.forall(_.getAs[String]("sb").matches("[01]{8}")))
      // the Project carrying the native expressions must be INSIDE a
      // WholeStageCodegen span — CollapseCodegenStages pushes any
      // operator holding a CodegenFallback expression out of it, which
      // is exactly the regression this guards against
      import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
      val wsc = df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
      assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
      val fused = wsc.flatMap(_.collect { case p: ProjectExec => p })
        .flatMap(_.projectList).exists(_.exists {
          case _: graft.functions.TokenShingles => true
          case _: graft.functions.MinhashBands => true
          case _: graft.functions.QuantizeVector => true
          case _: graft.functions.TokenStats => true
          case _: graft.functions.TokenFingerprint => true
          case _: graft.functions.SimhashBits => true
          case _: graft.functions.ZOrderLong => true
          case _: graft.functions.RollingChunks => true
          case _: graft.functions.AhashBands => true
          case _: graft.functions.PhashBands => true
          case _: graft.functions.AudioFpBands => true
          case _ => false
        })
      assert(fused,
        s"native expressions not fused into WholeStageCodegen:\n${df.queryExecution.executedPlan}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("Verify.registerAll covers every GraftExtensions function (registration-path parity)") {
    // Verify/Bench hoist registration before their concurrent pools;
    // a function injected by the extensions installer but missing from
    // registerAll would re-introduce the mid-analysis registration
    // race this parity check exists to prevent.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(defaultCpus = 2)
      .appName("graft-registerall-parity")
      .getOrCreate()
    try {
      Verify.registerAll(spark)
      val missing = (new GraftExtensions).functionNames
        .filterNot(spark.catalog.functionExists)
      assert(missing.isEmpty,
        s"registerAll does not register: ${missing.mkString(", ")}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("GraftExtensions covers every registerAll function (reverse parity — r16 advice #2)") {
    // the forward check above proves registerAll ⊇ extensions; without
    // THIS direction a new SketchAggregates registration can silently
    // skip the installer (label_argmax and topk_edges did exactly that
    // in r16), leaving cluster-deploy extensions-only sessions unable
    // to resolve the function in SQL text.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = GraftSession.builder(defaultCpus = 2)
      .appName("graft-extensions-reverse-parity")
      .getOrCreate()
    try {
      import scala.jdk.CollectionConverters._
      def tempFns: Set[String] = spark.catalog.listFunctions()
        .collectAsList().asScala.filter(_.isTemporary).map(_.name).toSet
      val before = tempFns
      Verify.registerAll(spark)
      // temp-function diff: empty when a shared JVM session was already
      // registered (getOrCreate reuse) — the static floor below keeps
      // the test non-vacuous in that case
      val registered = tempFns -- before
      val injected = (new GraftExtensions).functionNames.toSet
      val missing = registered -- injected
      assert(missing.isEmpty,
        s"GraftExtensions does not inject: ${missing.mkString(", ")}")
      // static floor: the r16 escapees stay pinned by name
      val floor = Set("label_argmax", "topk_edges", "kmv_kmin", "bloom_build")
      assert((floor -- injected).isEmpty,
        s"GraftExtensions lost: ${(floor -- injected).mkString(", ")}")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
