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

  test("nearestCid matches the literal least()-over-structs form exactly") {
    import graft.functions.GraftFunctions.nearestCid
    // the form bestCidExpr used before going native — kept here as the
    // equivalence oracle (d2 = dot(v,v) - 2·dot(v,c) + Σc², min by
    // (d2, cid) struct ordering)
    def literalForm(v: org.apache.spark.sql.Column,
        book: Seq[(Long, Seq[Double])]): org.apache.spark.sql.Column = {
      val scored = book.map { case (cid, cv) =>
        val cl = array(cv.map(lit): _*)
        struct((dotp(v, v) - lit(2.0) * dotp(v, cl) +
          lit(cv.map(x => x * x).sum)).as("d2"), lit(cid).as("cid"))
      }
      (if (scored.size == 1) scored.head else least(scored: _*))
        .getField("cid")
    }
    val book = (0L until 8L).map(c =>
      c -> (1 to 4).map(i => math.sin(c * 13 + i) * 2).toSeq)
    val vecs = (0 until 50).map(r => (1 to 4).map(i =>
      math.cos(r * 7 + i) * 3).toSeq)
    val df = vecs.toDF("v").select(
      nearestCid(col("v"), book).as("native"),
      literalForm(col("v"), book).as("literal"))
    assert(df.filter(col("native") =!= col("literal")).count() === 0)
    // tie case: two identical centroids → smallest cid wins in both
    val tieBook = Seq(3L -> Seq(1.0, 1.0), 5L -> Seq(1.0, 1.0))
    val tie = Seq(Seq(1.0, 1.0)).toDF("v").select(
      nearestCid(col("v"), tieBook).as("n"),
      literalForm(col("v"), tieBook).as("l")).head()
    assert(tie.getLong(0) === 3L && tie.getLong(1) === 3L)
  }

  test("pqAdc: fixed left-to-right lookup sum; null codes → null") {
    import graft.functions.GraftFunctions.pqAdc
    // m=3 subspaces, stride 4: table[s*4 + c]
    val table = Array.tabulate(12)(i => (i + 1) * 0.125)
    val df = Seq(Seq(2L, 0L, 3L)).toDF("codes").select(
      pqAdc(col("codes"), table, 4).as("adc"),
      pqAdc(lit(null).cast("array<bigint>"), table, 4).as("nul"))
    val r = df.head()
    assert(r.getDouble(0) === table(2) + table(4) + table(11))
    assert(r.isNullAt(1))
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
