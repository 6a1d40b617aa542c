package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable route (`zip_with` + `aggregate` higher-order functions)
  * evaluates a lambda per element through interpreted `HigherOrderFunction`
  * machinery — correct, but never inside WholeStageCodegen's tight loop.
  * For ANN over millions of vectors the dot product IS the workload, so it
  * gets a first-class `Expression` with `doGenCode` emitting a plain Java
  * loop over the underlying `ArrayData` (no boxing, no lambda dispatch).
  * This is preference order (b) of the build brief: a custom scalar
  * Expression, only where built-ins genuinely can't express the semantics
  * efficiently.
  */
abstract class FloatVectorBinaryExpression extends BinaryExpression
    with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
}

/** Exact dot product of two float vectors (linear loop, double accum). */
case class DotProductFloat(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {

  override def prettyName: String = "vector_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0d
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float vectors in ONE pass (dot + both norms in
  * the same loop — the fused kernel the three-expression composition
  * cannot produce). Zero-norm input yields NaN, matching the composed
  * arithmetic.
  */
case class CosineSimilarityFloat(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {

  override def prettyName: String = "vector_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer-quantized cosine (×2²⁰, round half-up, exact-integer doubles)
  * fused into one pass — the native kernel twin of
  * `Similarity.cosineQuantizedComposed`, BIT-IDENTICAL by construction:
  * per element the quantized value is the same (half-up rounding of an
  * exactly-representable product; `floor(x+0.5)` / `ceil(x-0.5)` is
  * exact below 2⁵¹), and all three accumulators add the same values in
  * the same ascending order.
  */
case class CosineQuantizedFloat(left: Expression, right: Expression)
    extends FloatVectorBinaryExpression {

  override def prettyName: String = "vector_cosine_quantized"

  @inline private def q(x: Double): Double = {
    val s = x * 1048576.0d
    if (s >= 0) math.floor(s + 0.5d) else math.ceil(s - 0.5d)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0d
    var na = 0.0d
    var nb = 0.0d
    var i = 0
    while (i < n) {
      val x = q(a.getFloat(i).toDouble)
      val y = q(b.getFloat(i).toDouble)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $sx = ((double) $a.getFloat($i)) * 1048576.0;
         |  double $sy = ((double) $b.getFloat($i)) * 1048576.0;
         |  double $x = $sx >= 0 ? java.lang.Math.floor($sx + 0.5) : java.lang.Math.ceil($sx - 0.5);
         |  double $y = $sy >= 0 ? java.lang.Math.floor($sy + 0.5) : java.lang.Math.ceil($sy - 0.5);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket id fused into one pass: per plane the
  * sign of Σ_d q(v_d)·w(p,d) becomes bit p, with the quantization and the
  * integer Weyl-style weights exactly matching the composed
  * `Similarity.hyperplaneBucketComposed` (same half-up quantize, same
  * long arithmetic, same ascending-dimension accumulation per plane) —
  * bucket assignments are therefore identical, just computed in a single
  * primitive loop instead of `planes` interpreted HOF folds per row.
  */
case class HyperplaneBucketFloat(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  override def prettyName: String = "hyperplane_bucket"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0d
      var d = 0
      while (d < n) {
        val sx = a.getFloat(d).toDouble * 1048576.0d
        val qx = if (sx >= 0) math.floor(sx + 0.5d) else math.ceil(sx - 0.5d)
        val t = (p.toLong * 64L + d.toLong) * 2654435761L
        val m = ((t % 2147483648L) + 2147483648L) % 2147483648L
        s += qx * (m - 1073741824L).toDouble
        d += 1
      }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val sx = ctx.freshName("sx")
      val qx = ctx.freshName("qx")
      val t = ctx.freshName("t")
      val m = ctx.freshName("m")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $input.numElements();
         |long $bucket = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    double $sx = ((double) $input.getFloat($d)) * 1048576.0;
         |    double $qx = $sx >= 0 ? java.lang.Math.floor($sx + 0.5) : java.lang.Math.ceil($sx - 0.5);
         |    long $t = (((long) $p) * 64L + (long) $d) * 2654435761L;
         |    long $m = (($t % 2147483648L) + 2147483648L) % 2147483648L;
         |    $s += $qx * (double) ($m - 1073741824L);
         |  }
         |  if ($s >= 0) $bucket |= (1L << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Score array against a whole CODEBOOK in one fused pass — the
  * broadcast-codebook replacement for building `array(score(vec, c₀),
  * score(vec, c₁), …)` out of k per-centroid literal sub-trees: that
  * form embeds k·d literals in the plan, and Catalyst analysis/codegen
  * strain long before data moves once k reaches the thousands a real
  * IVF/SemDeDup codebook uses. Here the codebook rides along as ONE
  * reference object (broadcast with the task closure), the expression
  * tree is a single node regardless of k, and the emitted loop is the
  * same primitive nested scan either way. Downstream argmin/argmax and
  * probe-slice composition over the returned array is unchanged — and
  * per-element results are BIT-IDENTICAL to the composed form (same
  * per-term arithmetic in the same ascending-dimension order; pinned in
  * VectorExpressionsSpec).
  */
abstract class CodebookScoresExpression
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  def codebook: Array[Array[Float]]
  require(codebook.nonEmpty, s"$prettyName requires a non-empty codebook")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
    }
}

/** Squared-L2 score per centroid: out[j] = (v·v − 2·v·cⱼ) + cⱼ·cⱼ, the
  * exact association of `Ivf.dist2`'s composed form (cⱼ·cⱼ is
  * precomputed driver-side in ascending-dimension order, as the literal
  * fold was).
  */
case class CentroidL2Scores(child: Expression, codebook: Array[Array[Float]])
    extends CodebookScoresExpression {

  override def prettyName: String = "centroid_l2_scores"

  private val cc: Array[Double] =
    codebook.map(c => c.map(x => x.toDouble * x.toDouble).sum)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var vv = 0.0d
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; vv += x * x; i += 1 }
    val out = new Array[Double](codebook.length)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val m = math.min(n, c.length)
      var dot = 0.0d
      var d = 0
      while (d < m) { dot += a.getFloat(d).toDouble * c(d).toDouble; d += 1 }
      out(j) = vv - 2.0d * dot + cc(j)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][]")
    val ccRef = ctx.addReferenceObj("centroidNorms", cc, "double[]")
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val x = ctx.freshName("x")
      val vv = ctx.freshName("vv")
      val dot = ctx.freshName("dot")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = $input.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $input.getFloat($i);
         |  $vv += $x * $x;
         |}
         |double[] $out = new double[${codebook.length}];
         |for (int $j = 0; $j < ${codebook.length}; $j++) {
         |  float[] $c = $cbRef[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    $dot += ((double) $input.getFloat($d)) * ((double) $c[$d]);
         |  }
         |  $out[$j] = $vv - 2.0 * $dot + $ccRef[$j];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer-quantized cosine score per centroid — the codebook-wide twin
  * of [[CosineQuantizedFloat]], same quantization and accumulation
  * order per centroid. The vector's quantized components are computed
  * once per row instead of once per centroid (bit-identical either
  * way: half-up quantization is deterministic).
  */
case class CentroidCosineQuantizedScores(child: Expression,
                                         codebook: Array[Array[Float]])
    extends CodebookScoresExpression {

  override def prettyName: String = "centroid_cosq_scores"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val qv = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = a.getFloat(i).toDouble * 1048576.0d
      qv(i) = if (s >= 0) math.floor(s + 0.5d) else math.ceil(s - 0.5d)
      i += 1
    }
    val out = new Array[Double](codebook.length)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val m = math.min(n, c.length)
      var dot = 0.0d
      var na = 0.0d
      var nb = 0.0d
      var d = 0
      while (d < m) {
        val sy = c(d).toDouble * 1048576.0d
        val y = if (sy >= 0) math.floor(sy + 0.5d) else math.ceil(sy - 0.5d)
        val x = qv(d)
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      out(j) = dot / (math.sqrt(na) * math.sqrt(nb))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][]")
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val sy = ctx.freshName("sy")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val qv = ctx.freshName("qv")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $n = $input.numElements();
         |double[] $qv = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $s = ((double) $input.getFloat($i)) * 1048576.0;
         |  $qv[$i] = $s >= 0 ? java.lang.Math.floor($s + 0.5) : java.lang.Math.ceil($s - 0.5);
         |}
         |double[] $out = new double[${codebook.length}];
         |for (int $j = 0; $j < ${codebook.length}; $j++) {
         |  float[] $c = $cbRef[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    double $sy = ((double) $c[$d]) * 1048576.0;
         |    double $y = $sy >= 0 ? java.lang.Math.floor($sy + 0.5) : java.lang.Math.ceil($sy - 0.5);
         |    double $x = $qv[$d];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  $out[$j] = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid id by quantized cosine, argmax fused INTO the
  * codebook loop — no per-row score array materializes (at k = 10⁴ the
  * composed `array_position(scores, array_max(scores))` allocates an
  * 80 KB temporary per row; here the running best lives in two
  * registers). Selection reproduces Spark's array ordering exactly:
  * NaN sorts greatest, ±0.0 compare equal (zeros are canonicalized
  * before `Double.compare`), ties keep the FIRST (lowest) centroid id —
  * pinned bit-identical to the composed form in VectorExpressionsSpec.
  */
case class NearestCentroidCosQ(child: Expression, codebook: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {

  require(codebook.nonEmpty, s"$prettyName requires a non-empty codebook")

  override def prettyName: String = "nearest_centroid_cosq"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val qv = new Array[Double](n)
    var i = 0
    while (i < n) {
      val s = a.getFloat(i).toDouble * 1048576.0d
      qv(i) = if (s >= 0) math.floor(s + 0.5d) else math.ceil(s - 0.5d)
      i += 1
    }
    var best = 0L
    var bestScore = Double.NegativeInfinity
    var first = true
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      val m = math.min(n, c.length)
      var dot = 0.0d
      var na = 0.0d
      var nb = 0.0d
      var d = 0
      while (d < m) {
        val sy = c(d).toDouble * 1048576.0d
        val y = if (sy >= 0) math.floor(sy + 0.5d) else math.ceil(sy - 0.5d)
        val x = qv(d)
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      var score = dot / (math.sqrt(na) * math.sqrt(nb))
      if (score == 0.0d) score = 0.0d // canonicalize -0.0 (Spark: ±0 equal)
      if (first || java.lang.Double.compare(score, bestScore) > 0) {
        best = j.toLong; bestScore = score; first = false
      }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", codebook, "float[][]")
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val sy = ctx.freshName("sy")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val qv = ctx.freshName("qv")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val score = ctx.freshName("score")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val firstFlag = ctx.freshName("first")
      s"""
         |int $n = $input.numElements();
         |double[] $qv = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $s = ((double) $input.getFloat($i)) * 1048576.0;
         |  $qv[$i] = $s >= 0 ? java.lang.Math.floor($s + 0.5) : java.lang.Math.ceil($s - 0.5);
         |}
         |long $best = 0L;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |boolean $firstFlag = true;
         |for (int $j = 0; $j < ${codebook.length}; $j++) {
         |  float[] $c = $cbRef[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    double $sy = ((double) $c[$d]) * 1048576.0;
         |    double $y = $sy >= 0 ? java.lang.Math.floor($sy + 0.5) : java.lang.Math.ceil($sy - 0.5);
         |    double $x = $qv[$d];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $score = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($score == 0.0) $score = 0.0;
         |  if ($firstFlag || java.lang.Double.compare($score, $bestScore) > 0) {
         |    $best = (long) $j; $bestScore = $score; $firstFlag = false;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Affine projection onto a broadcast basis: `y_j = Σ_i (x_i − mean_i)
  * · basis_j,i` — the PCA/whitening map ([[graft.ext.Pca]]). One fused
  * m×d loop per row (basis rows pre-scaled by 1/√λ fold whitening into
  * the same kernel); the basis travels as a reference object, never as
  * plan literals, so m·d can grow without bloating the expression tree.
  */
case class AffineProject(child: Expression, mean: Array[Double],
                         basis: Array[Array[Double]])
    extends UnaryExpression with Serializable {

  require(basis.nonEmpty, s"$prettyName requires a non-empty basis")

  override def prettyName: String = "affine_project"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](basis.length)
    var j = 0
    while (j < basis.length) {
      val b = basis(j)
      val m = math.min(n, math.min(b.length, mean.length))
      var acc = 0.0d
      var i = 0
      while (i < m) {
        acc += (a.getFloat(i).toDouble - mean(i)) * b(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("projMean", mean, "double[]")
    val basisRef = ctx.addReferenceObj("projBasis", basis, "double[][]")
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      s"""
         |int $n = $input.numElements();
         |double[] $out = new double[${basis.length}];
         |for (int $j = 0; $j < ${basis.length}; $j++) {
         |  double[] $b = $basisRef[$j];
         |  int $m = java.lang.Math.min($n,
         |    java.lang.Math.min($b.length, $meanRef.length));
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += (((double) $input.getFloat($i)) - $meanRef[$i]) * $b[$i];
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API + SQL registration. */
object VectorFunctions {

  def affine_project(vec: Column, mean: Array[Double],
                     basis: Array[Array[Double]]): Column =
    GraftColumnBridge.column(AffineProject(
      GraftColumnBridge.expression(vec), mean, basis))

  def vector_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductFloat(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vector_cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarityFloat(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def vector_cosine_quantized(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineQuantizedFloat(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def hyperplane_bucket(vec: Column, planes: Int): Column =
    GraftColumnBridge.column(HyperplaneBucketFloat(
      GraftColumnBridge.expression(vec), planes))

  def centroid_l2_scores(vec: Column, codebook: Array[Array[Float]]): Column =
    GraftColumnBridge.column(CentroidL2Scores(
      GraftColumnBridge.expression(vec), codebook))

  def centroid_cosq_scores(vec: Column, codebook: Array[Array[Float]]): Column =
    GraftColumnBridge.column(CentroidCosineQuantizedScores(
      GraftColumnBridge.expression(vec), codebook))

  def nearest_centroid_cosq(vec: Column, codebook: Array[Array[Float]]): Column =
    GraftColumnBridge.column(NearestCentroidCosQ(
      GraftColumnBridge.expression(vec), codebook))

  /** Make the functions available to `spark.sql` text queries. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vector_dot",
      exprs => DotProductFloat(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("vector_cosine",
      exprs => CosineSimilarityFloat(exprs.head, exprs(1)), "built-in")
  }
}
