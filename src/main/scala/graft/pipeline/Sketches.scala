package graft.pipeline

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based counting for corpus statistics at scales where exact
  * per-key state is infeasible. The hash family is md5-derived
  * (`md5Hash60(key || "#" || row)`), so sketch contents are
  * deterministic and replayable by any engine — the DuckDB oracle
  * rebuilds the identical sketch.
  *
  * At 100 TB the value is the memory contract: a count-min sketch is a
  * fixed `depth × width` integer grid, built with one map-side-combined
  * aggregation and mergeable across partitions/streams by cell-wise
  * addition — no vocabulary-sized state anywhere until the (bounded)
  * candidate read-out.
  */
object Sketches {

  /** Count-min sketch of token frequencies (Cormode & Muthukrishnan
    * 2005): `depth` hash rows × `width` buckets, cell = Σ counts of
    * tokens hashing there. Returns `(row, bucket, c)` — the sketch
    * itself, `depth·width` rows regardless of corpus size.
    *
    * Built from the (token, count) relation rather than raw tokens so
    * the explode-by-depth multiplies vocabulary rows, not corpus rows.
    */
  def cmsSketch(tokenCounts: DataFrame, depth: Int = 4, width: Int = 1024,
      tokenCol: String = "token", cntCol: String = "cnt"): DataFrame = {
    val rows = explode(array((0 until depth).map(i =>
      struct(lit(i).as("row"),
        cmsBucket(col(tokenCol), i, width).as("bucket"))): _*)).as("rb")
    tokenCounts
      .select(col(cntCol), rows)
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum(col(cntCol)).as("c"))
  }

  /** Bucket of `token` in hash row `i`: `md5hash60(token#i) mod width`. */
  def cmsBucket(token: Column, i: Int, width: Int): Column =
    pmod(GraftFunctions.md5Hash60(concat(token, lit("#"), lit(i.toString))),
      lit(width.toLong))

  /** Heavy hitters with their CMS estimates: the true top-`k` tokens by
    * exact count, each annotated with the sketch's point estimate
    * (min over the depth rows of the addressed cells). The estimate
    * never undershoots the true count (CMS guarantee — spec'd); the gap
    * is the collision error `≤ e/width · Σcounts` w.h.p.
    *
    * The candidate set is bounded (top-k), so the read-out join touches
    * `k·depth` sketch cells — the sketch stays the only corpus-wide
    * state.
    */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 20, depth: Int = 4,
      width: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tc = TextAnalysis.withTokens(docs, textCol)
      .select(explode(col("w_")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = cmsSketch(tc, depth, width)
    // true top-k (deterministic ties by token) → bounded candidate frame
    val cand = tc.orderBy(col("cnt").desc, col("token")).limit(k)
    // address row i's cell for every candidate; min across rows
    val addressed = (0 until depth).map { i =>
      cand.withColumn("row", lit(i))
        .withColumn("bucket", cmsBucket(col("token"), i, width))
    }.reduce(_ unionByName _)
    val out = addressed
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("c")).as("est"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    tc.unpersist()
    out
  }
}
