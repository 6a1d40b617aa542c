package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused product-quantization kernels.
  *
  * The composable PQ plan builds m × k literal centroid arrays with a
  * dot-product sub-tree per centroid; at m=8, k=16 the generated
  * whole-stage method passes 12,000 lines and janino refuses to
  * compile it — Spark silently drops the stage to interpreted mode,
  * the exact codebook-literal failure mode the broadcast-codebook
  * kernels removed from IVF/SemDeDup. These two expressions carry the
  * codebooks as reference objects instead: one m·k·subDim loop per
  * row, bit-identical arithmetic to the literal plan (sequential
  * accumulation in the same order), tiny generated code.
  */

/** PQ byte codes: per subspace, the index of the centroid minimizing
  * `c·c − 2·sub·c` (the `|sub−c|²` argmin with the constant `sub·sub`
  * dropped); ties take the lowest index, matching
  * `array_position(scores, array_min(scores))`.
  */
case class PqEncodeCodes(child: Expression,
                         codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    s"$prettyName requires a non-empty codebook grid")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  // c·c per (subspace, centroid), summed in the same sequential order
  // as the literal plan's Scala `.sum`
  private val cc: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x.toDouble * x.toDouble).sum))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codebooks(j).length) {
        val cent = codebooks(j)(c)
        val lim = math.min(subDim, math.max(0, n - base))
        var dot = 0.0d
        var i = 0
        while (i < lim) {
          dot += a.getFloat(base + i).toDouble * cent(i).toDouble
          i += 1
        }
        val d = cc(j)(c) - 2.0d * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    val ccRef = ctx.addReferenceObj("pqNorms", cc, "double[][]")
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val out = ctx.freshName("out")
      s"""
         |int $n = $input.numElements();
         |int[] $out = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $subDim;
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cbRef[$j].length; $c++) {
         |    float[] $cent = $cbRef[$j][$c];
         |    int $lim = java.lang.Math.min($subDim,
         |      java.lang.Math.max(0, $n - $base));
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $dot += ((double) $input.getFloat($base + $i))
         |        * ((double) $cent[$i]);
         |    }
         |    double $d = $ccRef[$j][$c] - 2.0 * $dot;
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$j] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC tables: per subspace j and centroid c, the exact
  * sub-distance `sub·sub − 2·sub·c + c·c` — same association order as
  * the literal plan (`(ss − 2·dot) + cc`), `sub·sub` computed once per
  * subspace.
  */
case class PqAdcTables(child: Expression,
                       codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with Serializable {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    s"$prettyName requires a non-empty codebook grid")

  override def prettyName: String = "pq_adc_tables"
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

  private val cc: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x.toDouble * x.toDouble).sum))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    val rows = new Array[AnyRef](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val lim = math.min(subDim, math.max(0, n - base))
      var ss = 0.0d
      var i = 0
      while (i < lim) {
        val x = a.getFloat(base + i).toDouble
        ss += x * x
        i += 1
      }
      val row = new Array[Double](codebooks(j).length)
      var c = 0
      while (c < codebooks(j).length) {
        val cent = codebooks(j)(c)
        var dot = 0.0d
        var k = 0
        while (k < lim) {
          dot += a.getFloat(base + k).toDouble * cent(k).toDouble
          k += 1
        }
        row(c) = ss - 2.0d * dot + cc(j)(c)
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    val ccRef = ctx.addReferenceObj("pqNorms", cc, "double[][]")
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val base = ctx.freshName("base")
      val lim = ctx.freshName("lim")
      val ss = ctx.freshName("ss")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val cent = ctx.freshName("cent")
      val row = ctx.freshName("row")
      val rows = ctx.freshName("rows")
      s"""
         |int $n = $input.numElements();
         |Object[] $rows = new Object[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $base = $j * $subDim;
         |  int $lim = java.lang.Math.min($subDim,
         |    java.lang.Math.max(0, $n - $base));
         |  double $ss = 0.0;
         |  for (int $i = 0; $i < $lim; $i++) {
         |    double $x = (double) $input.getFloat($base + $i);
         |    $ss += $x * $x;
         |  }
         |  double[] $row = new double[$cbRef[$j].length];
         |  for (int $c = 0; $c < $cbRef[$j].length; $c++) {
         |    float[] $cent = $cbRef[$j][$c];
         |    double $dot = 0.0;
         |    for (int $k = 0; $k < $lim; $k++) {
         |      $dot += ((double) $input.getFloat($base + $k))
         |        * ((double) $cent[$k]);
         |    }
         |    $row[$c] = $ss - 2.0 * $dot + $ccRef[$j][$c];
         |  }
         |  $rows[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-side ADC distance: Σⱼ tables[j][codes[j]] — the PER-PROBED-ROW
  * hot loop of every IVF-PQ query. The composable form
  * (`aggregate(zip_with(tables, codes, element_at))`) is an interpreted
  * higher-order chain costing ~µs/row; at a few million probed rows per
  * query batch that interpretation dominated the whole query (measured
  * in the r8 ANN sweep: 14.0 s vs 1.3 s for plain IVF on the same
  * probed volume). This kernel is the codegen twin: m array lookups and
  * a sequential double accumulation in the SAME order as `aggregate`'s
  * left fold, so scores are bit-identical.
  *
  * A tables/codes arity mismatch is impossible by construction (both
  * derive from one model's m) and FAILS LOUDLY rather than
  * null-propagating.
  */
case class PqAdcDistance(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def prettyName: String = "pq_adc_distance"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<array<double>>, array<int>), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(t: Any, c: Any): Any = {
    val tables = t.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (tables.numElements() != m)
      throw new IllegalStateException(
        s"$prettyName: ${tables.numElements()} tables for $m codes")
    var acc = 0.0d
    var j = 0
    while (j < m) {
      acc += tables.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tables, codes) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |if ($tables.numElements() != $m) {
         |  throw new IllegalStateException("pq_adc_distance: "
         |    + $tables.numElements() + " tables for " + $m + " codes");
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $tables.getArray($j).getDouble($codes.getInt($j));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {

  def pq_encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqEncodeCodes(
      GraftColumnBridge.expression(vec), codebooks))

  def pq_adc_tables(vec: Column,
                    codebooks: Array[Array[Array[Float]]]): Column =
    GraftColumnBridge.column(PqAdcTables(
      GraftColumnBridge.expression(vec), codebooks))

  def pq_adc_distance(tables: Column, codes: Column): Column =
    GraftColumnBridge.column(PqAdcDistance(
      GraftColumnBridge.expression(tables), GraftColumnBridge.expression(codes)))
}
