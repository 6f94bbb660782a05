package graft

import graft.functions.GraftFunctions.{cosineSim, dotp}
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*) = array(xs.map(lit): _*)

  test("dot product: values, shorter-input-wins, nulls, empty") {
    val df = spark.range(1).select(
      dotp(vec(1, 2, 3), vec(4, 5, 6)).as("basic"),
      dotp(vec(1, 2, 3), vec(4, 5)).as("mismatch"), // shorter wins
      dotp(array().cast("array<double>"), vec(1.0)).as("empty"),
      dotp(lit(null).cast("array<double>"), vec(1.0)).as("nul"))
    val r = df.head()
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 14.0)
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3))
  }

  test("codegen'd loop matches the declarative fold bit-for-bit") {
    // random-ish doubles with non-associative rounding: a reordered sum
    // would differ in the last ulp — both paths must fold left
    val xs = (1 to 64).map(i => math.sin(i) * 1e3)
    val ys = (1 to 64).map(i => math.cos(i) / 7.0)
    val df = Seq((xs, ys)).toDF("a", "b")
      .select(
        dotp(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
          lit(0.0), (acc, v) => acc + v).as("fold"))
    val r = df.head()
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
      java.lang.Double.doubleToLongBits(r.getDouble(1)))
  }

  test("cosineSim agrees with dotp-derived cosine on float vectors") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
    val viaHelper = df.select(cosineSim(col("a"), col("b"))).as[Double].head()
    val ad = transform(col("a"), _.cast("double"))
    val bd = transform(col("b"), _.cast("double"))
    val viaDotp = df
      .select(dotp(ad, bd) / (sqrt(dotp(ad, ad)) * sqrt(dotp(bd, bd))))
      .as[Double].head()
    assert(viaHelper === viaDotp)
    assert(math.abs(viaHelper - 8.0 / 9.0) < 1e-12)
  }
}
