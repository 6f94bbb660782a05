package graft.pipeline

import graft.functions.GraftFunctions.{cosineSim, md5Hash60}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *   - [[bruteKnn]]: exact cosine top-k via join — the baseline, and the
  *     right answer when the query side is small (broadcast) even at large
  *     corpus scale.
  *   - [[lshKnn]]: random-hyperplane LSH — bucket both sides by sign
  *     patterns, search only within buckets. The scale path when both
  *     sides are huge: the join key is the bucket, not the pair.
  *
  * Hyperplanes are md5-derived, so buckets are deterministic and
  * reproducible in the oracle.
  */
object Similarity {

  /** Exact cosine top-k neighbors for each query row.
    * Output: (query_id, neighbor_id, cos).
    */
  def bruteKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = broadcast(q)
      .join(c, col("qid") =!= col("nid"))
      .withColumn("cos", cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection).
    * Brute join here; at corpus×corpus scale use `lshBuckets` to
    * pre-bucket and join per bucket.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = emb.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cos", cosineSim(col("v1"), col("v2")))
      .filter(col("cos") >= threshold)
      .select("id1", "id2", "cos")
  }

  /** Deterministic hyperplane component r[p][d] ∈ {-1000..1000}/1000,
    * derived from md5(p || '_' || d) — reproducible in any engine.
    */
  private def planeComponent(p: Int, d: Int) = {
    val h = md5Hash60(lit(s"${p}_$d"))
    ((pmod(h, lit(2001L)) - 1000L).cast("double")) / 1000.0
  }

  /** Sign-pattern LSH bucket id over `nPlanes` hyperplanes of table
    * `table`: bit p is set iff dot(vec, plane_{table,p}) > 0.
    */
  def lshBucket(vecCol: String, dim: Int, nPlanes: Int,
      table: Int = 0): org.apache.spark.sql.Column = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val bits = (0 until nPlanes).map { p =>
      val dot = (0 until dim)
        .map(d => element_at(v, d + 1) * planeComponent(table * nPlanes + p, d))
        .reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** One (table, bucket) pair per hash table — candidates are unioned
    * across tables, the standard LSH recall lever.
    */
  private def lshTableBuckets(vecCol: String, dim: Int, nPlanes: Int,
      nTables: Int) =
    explode(array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), lshBucket(vecCol, dim, nPlanes, t).as("b"))): _*))

  /** ANN top-k restricted to candidates sharing a bucket in ≥1 of
    * `nTables` hash tables. Trades recall for a bucket-key join: at 100 TB
    * the shuffle is on (table, bucket), never on (query × corpus); recall
    * scales with nTables, candidate cost with nTables/2^nPlanes.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nPlanes: Int = 8, nTables: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
      .withColumn("tb", lshTableBuckets("nv", dim, nPlanes, nTables))
      .select(col("nid"), col("nv"), col("tb.tbl"), col("tb.b"))
    val qb = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("tb", lshTableBuckets("qv", dim, nPlanes, nTables))
      .select(col("qid"), col("qv"), col("tb.tbl"), col("tb.b"))
    val cand = qb
      .join(cb, Seq("tbl", "b"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "qv", "nid", "nv")
      .dropDuplicates("qid", "nid") // same pair may collide in many tables
    val scored = cand.withColumn("cos", cosineSim(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }
}
