package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Slowly-changing-dimension TYPE 2 maintenance — the classic
  * warehouse dimension-versioning kernel the reference's load stage
  * stops short of (etl.py loads flat tables; any real sales warehouse
  * versions its customer/product dims).
  *
  * Contract: `current` carries the dimension with history columns
  * (`Version`, `ValidFrom`, `ValidTo`, `IsCurrent`); `changes` carries
  * one row per key with NEW values for the tracked attributes. Keys
  * whose tracked attributes differ from their current row get that row
  * CLOSED (`ValidTo` = effective date, `IsCurrent` = false) and a new
  * `Version`+1 row opened; change keys with no current row open a
  * `Version` 1 row (insert); unchanged keys, no-op changes, and
  * historical rows pass through untouched.
  *
  * Scale shape: one equi-join of the current slice with the change
  * batch on the dimension key — the batch is ingest-sized, so the join
  * broadcasts; nothing else touches the dimension. In production the
  * dimension is bucketed on the key and the rewrite is partition-local
  * (the AggMaintenance pattern); this kernel is the relational algebra
  * those rewrites apply. Deterministic: pure column comparisons, no
  * timestamps generated inside (the effective date is a parameter).
  */
object Scd {

  /** Apply a type-2 change batch. `changes` must carry `key` plus the
    * `tracked` columns (new values); all other `current` columns are
    * carried forward into the new version rows.
    *
    * Change semantics (null-aware): attribute comparison is NULL-SAFE
    * (`<=>`), so a change row setting a tracked attribute to NULL *is*
    * a real change (closes + re-opens), and NULL-to-NULL is a no-op —
    * not the silent no-op a plain `=!=` + coalesce would produce.
    * Change rows whose key has NO current dimension row are INSERTS:
    * they open a row with `ValidFrom` = effective, open `ValidTo`,
    * `IsCurrent` = true; non-tracked attribute columns of an inserted
    * row are NULL because the change feed carries only key + tracked
    * values. A key the dimension has never seen opens `Version` 1; a
    * RE-APPEARING key (every row closed — e.g. after a soft-delete)
    * CONTINUES its chain at max(historical `Version`) + 1, preserving
    * the contiguous-version/adjacent-chain invariant WarehouseSpec
    * asserts. The history lookup is bounded: it semi-joins the
    * (broadcastable) insert-key set before aggregating, so the scan
    * is hit-sized, never dimension-history-sized. */
  def scd2Apply(current: DataFrame, changes: DataFrame, key: String,
                tracked: Seq[String], effective: Column): DataFrame = {
    val outCols = current.columns.map(col).toSeq
    val cur = current.filter(col("IsCurrent"))
    val hist = current.filter(!col("IsCurrent"))
    val renamed = tracked.foldLeft(
      changes.select((key +: tracked).map(col): _*))(
      (d, c) => d.withColumnRenamed(c, s"New_$c"))
      .withColumn("ChgPresent", lit(true))
    // LEFT join (not full outer): the dimension side stays the probe
    // side of a BroadcastHashJoin with the ingest-sized change batch —
    // a full-outer join cannot broadcast and would shuffle the whole
    // current slice per batch. Inserts ride a separate anti-join
    // branch below (change-batch-sized on both sides).
    val joined = cur.join(renamed, Seq(key), "left")
    // a key with no change row, or a no-op change, is NOT a new
    // version; `<=>` makes set-to-NULL a detected change
    val differs = col("ChgPresent").isNotNull &&
      tracked.map(c => !(col(s"New_$c") <=> col(c))).reduce(_ || _)
    val unchanged = joined.filter(!differs).select(outCols: _*)
    val closed = joined.filter(differs)
      .withColumn("ValidTo", effective.cast(DateType))
      .withColumn("IsCurrent", lit(false))
      .select(outCols: _*)
    val opened = tracked.foldLeft(joined.filter(differs)) {
        (d, c) => d.withColumn(c, col(s"New_$c"))
      }
      .withColumn("Version", (col("Version") + 1).cast(IntegerType))
      .withColumn("ValidFrom", effective.cast(DateType))
      .withColumn("ValidTo", lit(null).cast(DateType))
      .withColumn("IsCurrent", lit(true))
      .select(outCols: _*)
    // inserts: change keys with no current row open a Version-1 row;
    // the anti join keys on the (broadcastable) change batch, so this
    // branch never touches the dimension beyond its key column
    val curType = current.schema
    val insertCols = curType.map { f =>
      if (f.name == key) col(key)
      else if (tracked.contains(f.name)) col(s"New_${f.name}").cast(f.dataType).as(f.name)
      else f.name match {
        // a re-appearing key (closed history, no current row) continues
        // its chain; a never-seen key starts at 1
        case "Version" => coalesce(col("PrevVersion") + 1, lit(1)).cast(f.dataType).as(f.name)
        case "ValidFrom" => effective.cast(f.dataType).as(f.name)
        case "ValidTo" => lit(null).cast(f.dataType).as(f.name)
        case "IsCurrent" => lit(true).cast(f.dataType).as(f.name)
        case _ => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val insertKeys = renamed.join(cur.select(col(key)), Seq(key), "left_anti")
    // historical max version for RE-APPEARING insert keys only: the
    // semi-join against the batch-sized insert-key set keeps this pass
    // hit-sized (broadcast probe into history), never a full
    // dimension-history aggregate
    val histMax = hist
      .join(broadcast(insertKeys.select(col(key))), Seq(key), "left_semi")
      .groupBy(col(key)).agg(max(col("Version")).as("PrevVersion"))
    val inserted = insertKeys
      .join(broadcast(histMax), Seq(key), "left")
      .select(insertCols: _*)
    hist.union(unchanged).union(closed).union(opened).union(inserted)
  }

  /** Epoch of the synthetic dataset (dimension birth date). */
  val DimBirth = "1992-01-01"
  /** Effective date of the first planted change batch. */
  val ChangeDate = "1998-01-01"
  /** Effective date of the second planted change batch. */
  val ChangeDate2 = "2000-01-01"

  /** The gate query: customers as a version-1 SCD2 dimension, with TWO
    * SEQUENTIAL planted deterministic change batches (the corpus ships
    * no change feed — the piiRedact pattern). Batch 1 (effective
    * [[ChangeDate]]): every custkey ≡ 3 (mod 7) moves to
    * `SEG<key mod 5>`. Batch 2 (effective [[ChangeDate2]]): every
    * custkey ≡ 2 (mod 6) moves to `SEG<key mod 4>B`. Keys in both
    * batches reach Version 3 (close→open→close→open), keys in one
    * reach Version 2, the rest pass through — so the gate hash proves
    * the two-batch COMPOSITION (the output of apply #1 is a valid
    * input to apply #2 and versions/validity chain correctly), not
    * just the single-batch kernel WarehouseSpec already spec-proves.
    * The kernel itself ([[scd2Apply]]) is feed-agnostic. */
  def scd2Customers(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(spark, dir).select(
      col("c_custkey").as("CustKey"),
      col("c_mktsegment").as("Segment"),
      lit(1).cast(IntegerType).as("Version"),
      to_date(lit(DimBirth)).as("ValidFrom"),
      lit(null).cast(DateType).as("ValidTo"),
      lit(true).as("IsCurrent"))
    val changes1 = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey").as("CustKey"),
        concat(lit("SEG"), (col("c_custkey") % 5).cast("string")).as("Segment"))
    val changes2 = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 6 === 2)
      .select(col("c_custkey").as("CustKey"),
        concat(lit("SEG"), (col("c_custkey") % 4).cast("string"), lit("B")).as("Segment"))
    val afterBatch1 =
      scd2Apply(dim, changes1, "CustKey", Seq("Segment"), to_date(lit(ChangeDate)))
    scd2Apply(afterBatch1, changes2, "CustKey", Seq("Segment"), to_date(lit(ChangeDate2)))
      .orderBy(col("CustKey"), col("Version"))
  }
}
