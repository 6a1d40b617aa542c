package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Winnowing window-minimum selection (Schleimer et al. 2003 §4) as a
  * fused codegen kernel: given a document's k-gram hash array, emit the
  * 0-based positions the winnow selects — each length-`w` window's
  * minimum, rightmost on ties, consecutive repeats collapsed (selected
  * positions are provably non-decreasing, so one `last` cursor
  * suffices). Composed from `transform`/`aggregate` lambdas this is
  * interpreted per-element dispatch over every window; here it is one
  * primitive O(n·w) loop per document, pipelined inside whole-stage
  * codegen like the MinHash/SimHash kernels.
  *
  * A document shorter than one window degrades to a single window over
  * what exists (n < w ⇒ one selection); an empty array selects nothing.
  */
case class WinnowPositions(child: Expression, w: Int)
    extends UnaryExpression with Serializable {

  require(w > 0, s"winnow window ($w) must be positive")

  override def prettyName: String = "winnow_positions"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val h = v.asInstanceOf[ArrayData]
    val n = h.numElements()
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val numWin = math.max(1, n - w + 1)
      val out = new Array[Long](numWin)
      var cnt = 0
      var last = -1L
      var i = 0
      while (i < numWin) {
        val end = math.min(i + w, n)
        var minV = Long.MaxValue
        var pos = i
        var j = i
        while (j < end) {
          if (h.getLong(j) <= minV) { minV = h.getLong(j); pos = j }
          j += 1
        }
        if (pos != last) { out(cnt) = pos; cnt += 1; last = pos }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val n = ctx.freshName("n")
      val numWin = ctx.freshName("numWin")
      val out = ctx.freshName("out")
      val cnt = ctx.freshName("cnt")
      val last = ctx.freshName("last")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val end = ctx.freshName("end")
      val minV = ctx.freshName("minV")
      val pos = ctx.freshName("pos")
      s"""
         |int $n = $input.numElements();
         |int $numWin = $n == 0 ? 0 : java.lang.Math.max(1, $n - $w + 1);
         |long[] $out = new long[$numWin];
         |int $cnt = 0;
         |long $last = -1L;
         |for (int $i = 0; $i < $numWin; $i++) {
         |  int $end = java.lang.Math.min($i + $w, $n);
         |  long $minV = Long.MAX_VALUE;
         |  long $pos = $i;
         |  for (int $j = $i; $j < $end; $j++) {
         |    if ($input.getLong($j) <= $minV) {
         |      $minV = $input.getLong($j);
         |      $pos = $j;
         |    }
         |  }
         |  if ($pos != $last) { $out[$cnt++] = $pos; $last = $pos; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($out, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPositions {
  /** Column wrapper: `winnow_positions(hashes, w)`. */
  def of(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowPositions(GraftColumnBridge.expression(hashes), w))
}
