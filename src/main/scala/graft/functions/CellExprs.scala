package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native centroid-table kernels: argmax-cosine cell assignment, PQ block
  * argmin encoding, and top-nProbe cell ranking — each a single generated
  * loop over a codebook held as a REFERENCE OBJECT, replacing the unrolled
  * literal-struct trees (`array_max(array(struct(cosine(...), lit), ...))`)
  * those operations previously compiled to.
  *
  * Why this matters at scale: the unrolled literal tree is O(k·dim) JAVA
  * SOURCE per expression. Under a `Generate` (explode) consume, Spark's
  * codegen cannot split oversized expressions into helper methods (the
  * inputs are local variables, not row fields), so at production k the
  * generated method crosses janino's 64 KB limit and the whole stage
  * SILENTLY falls back to interpreted execution — the exact plan you do
  * not want for a per-vector × per-centroid argmax over 100 TB. A loop
  * over a reference array is a few hundred bytes of code at ANY k, stays
  * inside whole-stage codegen, and runs faster than the unrolled form.
  *
  * Bit-exactness contract (the oracle replays these in SQL):
  *   - element loads mirror [[VecArrayInputs]] (float slots widen via
  *     `(double) getFloat`);
  *   - accumulation is left-to-right in double, matching [[VecDot]] /
  *     [[VecCosine]] and DuckDB's `list_dot_product`;
  *   - double comparisons use Spark's SQL ordering (NaN greatest,
  *     -0.0 == 0.0 — `nanSafeCompare` below), so tie/NaN behavior is
  *     identical to the `array_max`/`array_min` struct orderings they
  *     replace.
  */
private[graft] trait VecUnaryArrayInput { self: UnaryExpression =>

  protected def childElem: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"expected an array<float|double> argument, got ${other.catalogString}"
      )
  }

  protected def getD(a: ArrayData, i: Int): Double = childElem match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  /** Java source reading element `i` of `arr` as double. */
  protected def getCode(arr: String, i: String): String = childElem match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _         => s"$arr.getDouble($i)"
  }

  /** Spark SQL double ordering: NaN greatest (NaN == NaN), -0.0 == 0.0.
    * Mirrors `org.apache.spark.util.Utils.nanSafeCompareDoubles`, which is
    * what the struct orderings of `array_max`/`array_min` use.
    */
  protected final def nanSafeCompare(x: Double, y: Double): Int = {
    val xn = java.lang.Double.isNaN(x)
    val yn = java.lang.Double.isNaN(y)
    if ((xn && yn) || x == y) 0
    else if (xn) 1
    else if (yn) -1
    else if (x > y) 1
    else -1
  }

  /** Inline Java for [[nanSafeCompare]] as an int expression. */
  protected final def nanSafeCompareCode(x: String, y: String): String =
    s"(Double.isNaN($x) ? (Double.isNaN($y) ? 0 : 1) : " +
      s"(Double.isNaN($y) ? -1 : ($x == $y ? 0 : ($x > $y ? 1 : -1))))"
}

/** Argmax-cosine cell id against a centroid table: semantically identical
  * to `array_max(array(struct(cosine(emb, c_i), lit(cell_i)), ...)).cell`
  * — ties take the HIGHER cell id (struct lexicographic max), NaN cosines
  * rank greatest — but generated as one loop over a reference array.
  *
  * `cents` is (cell id, centroid) exactly as
  * [[graft.operators.Similarity.seedCentroids]] produces it.
  */
case class ArgmaxCosineCell(child: Expression, cents: Array[(Long, Array[Double])])
    extends UnaryExpression
    with VecUnaryArrayInput {

  override def dataType: DataType = LongType

  @transient private lazy val cellIds: Array[Long] = cents.map(_._1)
  @transient private lazy val flat: Array[Double] = cents.flatMap(_._2)
  @transient private lazy val dim: Int = if (cents.isEmpty) 0 else cents(0)._2.length

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    // query norm is shared by every cosine; each per-centroid cosine still
    // accumulates its own dot/na/nb exactly as VecCosine does
    var bestSim = 0.0
    var bestCell = 0L
    var j = 0
    while (j < cellIds.length) {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = getD(x, i)
        val yv = flat(j * dim + i)
        dot += xv * yv
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      val sim = dot / (math.sqrt(na) * math.sqrt(nb))
      val c = nanSafeCompare(sim, bestSim)
      if (j == 0 || c > 0 || (c == 0 && cellIds(j) > bestCell)) {
        bestSim = sim
        bestCell = cellIds(j)
      }
      j += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("amCells", cellIds, "long[]")
    val flatRef = ctx.addReferenceObj("amFlat", flat, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val sim = ctx.freshName("sim")
        val bestSim = ctx.freshName("bestSim")
        val bestCell = ctx.freshName("bestCell")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $dim);
          double $bestSim = 0.0;
          long $bestCell = 0L;
          for (int $j = 0; $j < ${cellIds.length}; $j++) {
            double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $xv = ${getCode(a, i)};
              double $yv = $flatRef[$j * $dim + $i];
              $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
            }
            double $sim = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
            int ${sim}_c = ${nanSafeCompareCode(sim, bestSim)};
            if ($j == 0 || ${sim}_c > 0 || (${sim}_c == 0 && $cellsRef[$j] > $bestCell)) {
              $bestSim = $sim; $bestCell = $cellsRef[$j];
            }
          }
          ${ev.value} = $bestCell;
        """
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PQ block argmin code: semantically identical to
  * `array_min(array(struct(d2(slice(emb), c_j), lit(j)), ...)).code` with
  * `d2 = (dot(x,x) - 2·dot(x,c)) + Σc²` — ties take the LOWER code, NaN
  * distances rank greatest (never win) — generated as one loop.
  *
  * `codebook(j)` is centroid j of this block; the block is the dsub-wide
  * slice of the embedding starting at 0-based `blockStart`.
  */
case class PqArgminCode(
    child: Expression,
    codebook: Array[Array[Double]],
    blockStart: Int,
    dsub: Int
) extends UnaryExpression
    with VecUnaryArrayInput {

  override def dataType: DataType = LongType

  @transient private lazy val flat: Array[Double] = codebook.flatten
  @transient private lazy val c2: Array[Double] = codebook.map(_.map(v => v * v).sum)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    // slice(emb, blockStart+1, dsub) stops at the array end; embeddings
    // are fixed-dim so the slice is always full in practice
    val n = math.max(0, math.min(x.numElements() - blockStart, dsub))
    var dotxx = 0.0
    var i = 0
    while (i < n) {
      val xv = getD(x, blockStart + i)
      dotxx += xv * xv
      i += 1
    }
    var bestD = 0.0
    var bestCode = 0L
    var j = 0
    while (j < codebook.length) {
      var dxc = 0.0
      i = 0
      while (i < n) {
        dxc += getD(x, blockStart + i) * flat(j * dsub + i)
        i += 1
      }
      val d2 = (dotxx - 2.0 * dxc) + c2(j)
      if (j == 0 || nanSafeCompare(d2, bestD) < 0) {
        bestD = d2
        bestCode = j.toLong
      }
      j += 1
    }
    bestCode
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val dotxx = ctx.freshName("dotxx")
        val dxc = ctx.freshName("dxc")
        val xv = ctx.freshName("xv")
        val d2 = ctx.freshName("d2")
        val bestD = ctx.freshName("bestD")
        val bestCode = ctx.freshName("bestCode")
        s"""
          int $n = java.lang.Math.max(0, java.lang.Math.min($a.numElements() - $blockStart, $dsub));
          double $dotxx = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = ${getCode(a, s"$blockStart + $i")};
            $dotxx += $xv * $xv;
          }
          double $bestD = 0.0;
          long $bestCode = 0L;
          for (int $j = 0; $j < ${codebook.length}; $j++) {
            double $dxc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dxc += ${getCode(a, s"$blockStart + $i")} * $flatRef[$j * $dsub + $i];
            }
            double $d2 = ($dotxx - 2.0 * $dxc) + $c2Ref[$j];
            if ($j == 0 || ${nanSafeCompareCode(d2, bestD)} < 0) {
              $bestD = $d2; $bestCode = (long) $j;
            }
          }
          ${ev.value} = $bestCode;
        """
      }
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-nProbe cell ids by cosine against a centroid table, descending —
  * semantically identical to
  * `slice(reverse(array_sort(array(struct(cosine, cell), ...))), 1, n)`
  * projected to the cell ids: descending by cosine, ties broken by HIGHER
  * cell id first, NaN cosines rank greatest. O(k·nProbe) selection loop —
  * no sort, no 64 KB literal tree.
  */
case class TopCellsByCosine(
    child: Expression,
    cents: Array[(Long, Array[Double])],
    nProbe: Int
) extends UnaryExpression
    with VecUnaryArrayInput {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val cellIds: Array[Long] = cents.map(_._1)
  @transient private lazy val flat: Array[Double] = cents.flatMap(_._2)
  @transient private lazy val dim: Int = if (cents.isEmpty) 0 else cents(0)._2.length

  private def simsOf(x: ArrayData): Array[Double] = {
    val n = math.min(x.numElements(), dim)
    val sims = new Array[Double](cellIds.length)
    var j = 0
    while (j < cellIds.length) {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = getD(x, i)
        val yv = flat(j * dim + i)
        dot += xv * yv
        na += xv * xv
        nb += yv * yv
        i += 1
      }
      sims(j) = dot / (math.sqrt(na) * math.sqrt(nb))
      j += 1
    }
    sims
  }

  override def nullSafeEval(a: Any): Any = evalTop(a.asInstanceOf[ArrayData])

  /** Public entry for the codegen call (nullSafeEval is protected). */
  def evalTop(x: ArrayData): ArrayData = {
    val sims = simsOf(x)
    val k = cellIds.length
    val take = math.min(nProbe, k)
    val taken = new Array[Boolean](k)
    val out = new Array[Long](take)
    var r = 0
    while (r < take) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!taken(j)) {
          if (best < 0) best = j
          else {
            // descending (sim, cell) — ties take the higher cell id,
            // matching reverse(array_sort(struct(sim, cell)))
            val c = nanSafeCompare(sims(j), sims(best))
            if (c > 0 || (c == 0 && cellIds(j) > cellIds(best))) best = j
          }
        }
        j += 1
      }
      taken(best) = true
      out(r) = cellIds(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the selection loop is control-flow heavy; delegate to the eval body
    // via a reference to this expression — still ONE virtual call per row
    // (vs k literal cosines inlined), and the surrounding stage stays
    // within whole-stage codegen
    val thisRef = ctx.addReferenceObj("topCells", this, classOf[TopCellsByCosine].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      a => s"${ev.value} = $thisRef.evalTop($a);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
