package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native nearest-centroid argmin over a codebook held as PLAIN DATA.
  *
  * The literal-expression form (`least()` over k `struct(d2, cid)`
  * literals — the k-means gate's original shape) is fine at gate
  * parameters (k=8) but collapses at production PQ parameters: k=256
  * centroids × m=16 subspaces is 4,096 struct literals per row, blowing
  * the 64KB JVM method limit (whole-stage codegen falls back to
  * interpreted mode) and costing minutes of driver plan construction.
  * Here the codebook is a flattened `double[]` CARRIED BY THE EXPRESSION
  * (Spark broadcasts the serialized task binary once per stage, so the
  * k·dim doubles ship like a broadcast variable, not per-row literals),
  * and the generated code is two tight primitive loops — one node in the
  * plan at any k.
  *
  * Arithmetic is BIT-IDENTICAL to the literal form so every oracle gate
  * replays unchanged: d2 = dot(v,v) − 2·dot(v,c) + Σc² with each dot a
  * sequential ascending-index fold (the [[DotProduct]] order), Σc²
  * precomputed on the driver with the same left fold, the final sum
  * associated `(qq − 2·qc) + cc`, and ties broken to the SMALLEST cid by
  * iterating cids in ascending order with a strict `<` improvement test
  * (what `least()` over (d2, cid) structs resolves to).
  *
  * @param cids  centroid ids, ascending (ties resolve to the first)
  * @param cents flattened centroids: centroid j occupies
  *              `[j*sub, (j+1)*sub)`
  * @param cc    per-centroid Σc², precomputed in ascending-index order
  */
case class NearestCentroid(child: Expression, cids: Array[Long],
    cents: Array[Double], cc: Array[Double], sub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var qq = 0.0
    var i = 0
    while (i < nv) { val x = v.getDouble(i); qq += x * x; i += 1 }
    val n = math.min(nv, sub)
    var best = Double.PositiveInfinity
    var bestCid = cids(0)
    var j = 0
    while (j < cids.length) {
      var qc = 0.0
      val base = j * sub
      i = 0
      while (i < n) { qc += v.getDouble(i) * cents(base + i); i += 1 }
      val d2 = qq - 2.0 * qc + cc(j)
      if (d2 < best) { best = d2; bestCid = cids(j) }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
      val ccRef = ctx.addReferenceObj("cc", cc, "double[]")
      val nv = ctx.freshName("nv")
      val qq = ctx.freshName("qq")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val qc = ctx.freshName("qc")
      val d2 = ctx.freshName("d2")
      val x = ctx.freshName("x")
      s"""
         |final int $nv = $v.numElements();
         |double $qq = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  final double $x = $v.getDouble($i); $qq += $x * $x;
         |}
         |final int $n = java.lang.Math.min($nv, $sub);
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCid = $cidsRef[0];
         |for (int $j = 0; $j < $cidsRef.length; $j++) {
         |  double $qc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $qc += $v.getDouble($i) * $centsRef[$j * $sub + $i];
         |  }
         |  final double $d2 = $qq - 2.0 * $qc + $ccRef[$j];
         |  if ($d2 < $best) { $best = $d2; $bestCid = $cidsRef[$j]; }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Nearest-centroid-by-COSINE id — the IVF coarse-assignment argmax as
  * one native node. The declarative form (corpus crossJoin broadcast
  * centroids → per-pair cosine → `max_by` re-aggregation) MATERIALIZES
  * n·c joined rows before the aggregate collapses them: with centroids
  * proportional to corpus size that is a quadratic volume of struct
  * rows through the join (measured 0.6 s → 22 s at 10× data). Here the
  * centroids ride as flattened expression data and each corpus row is
  * one tight loop — O(n·c) multiply-adds, ZERO intermediate rows.
  *
  * Arithmetic matches the declarative form bit-for-bit: cosine =
  * dot(v,c) / (sqrt(dot(v,v)) · cn) with every dot a sequential
  * ascending fold ([[DotProduct]] order) and `cn` the PRE-COMPUTED
  * per-centroid norm (pass the value Spark computed, don't re-derive).
  * The winner comparison is `java.lang.Double.compare(cos, best) > 0`
  * scanning cids ascending — exactly `max_by` over a (cos, -cid)
  * struct: greatest cosine wins, ties to the smallest cid, NaN ranked
  * greatest (Spark's total order).
  */
case class NearestCentroidCos(child: Expression, cids: Array[Long],
    cents: Array[Double], cn: Array[Double], sub: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE>, got ${dt.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "nearest_centroid_cos"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var qq = 0.0
    var i = 0
    while (i < nv) { val x = v.getDouble(i); qq += x * x; i += 1 }
    val vn = Math.sqrt(qq)
    val n = math.min(nv, sub)
    var best = Double.NegativeInfinity
    var bestCid = cids(0)
    var j = 0
    while (j < cids.length) {
      var qc = 0.0
      val base = j * sub
      i = 0
      while (i < n) { qc += v.getDouble(i) * cents(base + i); i += 1 }
      val cos = qc / (vn * cn(j))
      if (java.lang.Double.compare(cos, best) > 0) { best = cos; bestCid = cids(j) }
      j += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
      val centsRef = ctx.addReferenceObj("cents", cents, "double[]")
      val cnRef = ctx.addReferenceObj("cn", cn, "double[]")
      val nv = ctx.freshName("nv")
      val qq = ctx.freshName("qq")
      val vn = ctx.freshName("vn")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val qc = ctx.freshName("qc")
      val cos = ctx.freshName("cos")
      val x = ctx.freshName("x")
      s"""
         |final int $nv = $v.numElements();
         |double $qq = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  final double $x = $v.getDouble($i); $qq += $x * $x;
         |}
         |final double $vn = java.lang.Math.sqrt($qq);
         |final int $n = java.lang.Math.min($nv, $sub);
         |double $best = Double.NEGATIVE_INFINITY;
         |long $bestCid = $cidsRef[0];
         |for (int $j = 0; $j < $cidsRef.length; $j++) {
         |  double $qc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $qc += $v.getDouble($i) * $centsRef[$j * $sub + $i];
         |  }
         |  final double $cos = $qc / ($vn * $cnRef[$j]);
         |  if (java.lang.Double.compare($cos, $best) > 0) {
         |    $best = $cos; $bestCid = $cidsRef[$j];
         |  }
         |}
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidCos =
    copy(child = newChild)
}

/** Asymmetric-distance lookup sum over PQ codes: for one query's
  * precomputed per-subspace distance tables, `Σ_s table[s][code_s]` in
  * fixed left-to-right order (the association the oracle replays). The
  * Q·m·k table doubles travel as expression data (one node per query),
  * not as Q·m map literals — at production parameters (k=256, m=16)
  * the literal form is 4,096 map entries PER QUERY in the plan tree.
  *
  * @param table flattened `m × k` table: subspace s, code c at
  *              `s*k + c`. Codes index by cid, which training keeps in
  *              `[0, k)` (first-k-ids init).
  */
case class PqAdc(child: Expression, table: Array[Double], k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> codes, got ${dt.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table(s * k + codes.getLong(s).toInt)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val tableRef = ctx.addReferenceObj("table", table, "double[]")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      s"""
         |final int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $tableRef[$s * $k + (int) $codes.getLong($s)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
