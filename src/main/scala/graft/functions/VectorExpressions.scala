package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

/** Column-level API + SQL registration. */
object VectorFunctions {

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

  /** Make the functions available to `spark.sql` text queries. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vector_dot",
      exprs => DotProductFloat(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("vector_cosine",
      exprs => CosineSimilarityFloat(exprs.head, exprs(1)), "built-in")
  }
}
