package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Native vector kernels for the similarity family (scale/Similarity).
  *
  * The HOF form (`zip_with` + `aggregate`) does not codegen: at sf0.1 the
  * bucket-blocked near-dup pairs spent ~10 s in interpreted folds. This
  * expression is one fused loop over the two float arrays with the same
  * left-fold double-accumulation order, so values are bit-identical to the
  * HOF form and to DuckDB's `list_reduce`.
  */
object Vectors {
  /** Left-fold sum of elementwise double products of two float arrays. */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

object VectorsRange {
  /** Left-fold sum of elementwise double products over the 1-based index
    * range [from, from+len) of two float arrays — strict index order,
    * double per element: bit-identical to
    * `aggregate(zip_with(slice(a,from,len), slice(b,from,len), ...), 0.0,
    * (acc,v) -> acc+v)` and to DuckDB's `list_reduce` over the same
    * range (the matryoshka prefix-dim kernel).
    */
  def dotRange(a: ArrayData, b: ArrayData, from: Int, len: Int): Double = {
    val hi = math.min(from - 1 + len, math.min(a.numElements(), b.numElements()))
    var acc = 0.0d
    var i = from - 1
    while (i < hi) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `graft_dot_range(a, b, from, len)`: dot product of two ARRAY<FLOAT>
  * columns over a 1-based index range (prefix-dimension scoring).
  */
final case class DotRangeExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType),
    ArrayType(FloatType), org.apache.spark.sql.types.IntegerType,
    org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, f: Any, l: Any): Any =
    VectorsRange.dotRange(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      f.asInstanceOf[Number].intValue, l.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, f, l) =>
      s"graft.functions.VectorsRange.dotRange($a, $b, $f, $l)")
  override def prettyName: String = "graft_dot_range"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object VectorsL2 {
  /** Left-fold squared-L2 over 1-based index range [from, from+len) of
    * two float arrays — strict index order, double per element, the exact
    * fold the PQ oracle replays with `list_reduce`.
    */
  def l2sqRange(a: ArrayData, b: ArrayData, from: Int, len: Int): Double = {
    val hi = math.min(from - 1 + len, math.min(a.numElements(), b.numElements()))
    var acc = 0.0d
    var i = from - 1
    while (i < hi) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

/** `graft_l2sq_range(a, b, from, len)`: squared L2 distance of two
  * ARRAY<FLOAT> columns over a 1-based index range (the PQ subspace /
  * full-vector kernel).
  */
final case class L2SqRangeExpr(first: Expression, second: Expression,
                               third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType),
    ArrayType(FloatType), org.apache.spark.sql.types.IntegerType,
    org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, f: Any, l: Any): Any =
    VectorsL2.l2sqRange(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      f.asInstanceOf[Number].intValue, l.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, f, l) =>
      s"graft.functions.VectorsL2.l2sqRange($a, $b, $f, $l)")
  override def prettyName: String = "graft_l2sq_range"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object VectorsIntDot {
  /** Left-fold integer dot over the 1-based index range [from, from+len)
    * of two byte arrays (int8-quantized vectors) — pure 64-bit integer
    * arithmetic, so the value is EXACT (no accumulation-order concerns at
    * all, unlike the float kernels) and identical to any engine's integer
    * fold, including the DuckDB `list_reduce` the quantized oracles
    * replay. Max |term| is 127² and len ≤ dims, so overflow needs
    * dims > 2⁵⁰ — not a real vector.
    */
  def intDotRange(a: ArrayData, b: ArrayData, from: Int, len: Int): Long = {
    val hi = math.min(from - 1 + len, math.min(a.numElements(), b.numElements()))
    var acc = 0L
    var i = from - 1
    while (i < hi) {
      acc += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    acc
  }
}

/** `graft_int_dot_range(a, b, from, len)`: integer dot product of two
  * ARRAY<TINYINT> columns (int8-quantized vectors) over a 1-based index
  * range — the codegen'd within-list scoring kernel of the int8 ANN
  * family (`Quant.intDot`). One fused loop over the packed byte arrays;
  * the interpreted `aggregate(zip_with(...))` fold it replaces paid a
  * per-element lambda eval per candidate pair.
  */
final case class IntDotRangeExpr(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ByteType),
    ArrayType(ByteType), org.apache.spark.sql.types.IntegerType,
    org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override protected def nullSafeEval(a: Any, b: Any, f: Any, l: Any): Any =
    VectorsIntDot.intDotRange(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      f.asInstanceOf[Number].intValue, l.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, f, l) =>
      s"graft.functions.VectorsIntDot.intDotRange($a, $b, $f, $l)")
  override def prettyName: String = "graft_int_dot_range"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object VectorsQuant {
  /** Fused int8 symmetric quantization of a float vector: scale =
    * max(max|v|, 1e-30)/127 then q_i = floor(v_i/scale + 0.5), one pass
    * for the scale and one for the components — bit-identical to the HOF
    * chain `transform(v, x -> floor(x/qscale(v) + 0.5))` (same IEEE-754
    * double ops in the same order; spec-cross-checked) and to the DuckDB
    * replay the quantized oracles run. Null ELEMENTS match the HOF form
    * too: `greatest` skips nulls, so the scale aggregates the non-null
    * components, and `transform`'s lambda null-propagates — a null input
    * component yields a null output component, never a fabricated 0.
    */
  def quantizeI8(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var hasNull = false
    var m = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val v = math.abs(a.getFloat(i).toDouble)
        if (v > m) m = v
      }
      i += 1
    }
    val scale = math.max(m, 1e-30d) / 127
    if (!hasNull) {
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble / scale + 0.5d).toByte
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    } else {
      // slow path (null elements are outside the hot corpora): boxed array
      // so null components survive, exactly like the HOF lambda
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = math.floor(a.getFloat(i).toDouble / scale + 0.5d).toByte
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** `graft_quantize_i8(v)`: int8 symmetric quantization of an ARRAY<FLOAT>
  * to ARRAY<TINYINT> (per-vector scale, round-half-up) — the codegen'd
  * corpus-side pass of the int8 ANN family; the interpreted
  * aggregate+transform chain it replaces paid two lambda evals per
  * element per vector.
  */
final case class QuantizeI8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType)
  override protected def nullSafeEval(a: Any): Any =
    VectorsQuant.quantizeI8(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorsQuant.quantizeI8($a)")
  override def prettyName: String = "graft_quantize_i8"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorsSrp {
  /** Deterministic Rademacher hyperplane weight for (plane p, dim k):
    * ±1 from the parity of an affine mod-P hash — equidistributed over an
    * odd prime modulus, reproducible in integer SQL on any engine
    * (operands stay positive, so `%` agrees everywhere). 4096 ≥ any real
    * embedding dim keeps (p, k) pairs collision-free in the hash input.
    */
  @inline private def weightPositive(p: Int, k: Int): Boolean =
    ((1103515245L * (p * 4096L + k) + 12345L) % 2147483647L) % 2 == 1

  /** Banded sign-random-projection buckets: `bands` entries, band j's bit d
    * (MSB-first) is the sign of the Rademacher projection Σ_k w(j·r+d, k)·v_k
    * accumulated as a double left fold in dim order — bit-identical to the
    * `list_reduce` spelling the DuckDB oracles replay. Unlike the
    * axis-aligned [[graft.scale.Similarity.signBands]], every plane mixes
    * ALL dimensions, so the usable bit budget is unbounded by the embedding
    * dimensionality — the property that lets the band plan keep scaling
    * with the corpus (bands·bitsPerBand can exceed dim).
    */
  def srpBands(v: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](bands)
    var j = 0
    while (j < bands) {
      var bucket = 0
      var d = 0
      while (d < bitsPerBand) {
        val p = j * bitsPerBand + d
        var s = 0.0d
        var k = 0
        while (k < n) {
          val x = v.getFloat(k).toDouble
          s += (if (weightPositive(p, k)) x else -x)
          k += 1
        }
        if (s >= 0) bucket |= 1 << (bitsPerBand - 1 - d)
        d += 1
      }
      out(j) = bucket
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** `graft_srp_bands(v, bands, bitsPerBand)`: banded SRP band buckets of an
  * ARRAY<FLOAT> as ARRAY<INT> — the codegen'd blocking-key kernel of the
  * corpus-scaled vector near-dup family ([[graft.scale.Similarity]]
  * `vectorPostings` / `srpBandedNearDupPairs`).
  */
final case class SrpBandsExpr(first: Expression, second: Expression,
                              third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType),
    org.apache.spark.sql.types.IntegerType,
    org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any, b: Any, r: Any): Any =
    VectorsSrp.srpBands(v.asInstanceOf[ArrayData],
      b.asInstanceOf[Number].intValue, r.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b, r) =>
      s"graft.functions.VectorsSrp.srpBands($v, $b, $r)")
  override def prettyName: String = "graft_srp_bands"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_dot_f(a, b)`: dot product of two ARRAY<FLOAT> columns. */
final case class FloatDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Vectors.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Vectors.dotFloat($a, $b)")
  override def prettyName: String = "graft_dot_f"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorsTri {
  /** Upper-triangle (i ≤ j, row-major k order) pairwise products of the
    * 1e-6-quantized elements of a float array: vq = floor(v·1e6) exactly
    * as the SQL spelling `CAST(FLOOR(CAST(v AS DOUBLE) * 1000000D) AS
    * BIGINT)` (float→double cast exact, one rounded multiply, floor —
    * identical on any IEEE-754 engine), then p[k] = vq_i · vq_j with
    * k = i·n − i(i+1)/2 + j. One fused loop, one primitive long array —
    * the HOF form (nested transform + slice + struct explode) spends its
    * time in per-element interpreted eval and struct allocation.
    */
  def triProducts(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(a.getFloat(i).toDouble * 1000000d).toLong
      i += 1
    }
    val out = new Array[Long](n * (n + 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i
      val qi = q(i)
      while (j < n) {
        out(k) = qi * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** `graft_tri_products(vec)`: upper-triangle quantized pairwise products
  * of an ARRAY<FLOAT>, in row-major k = i·n−i(i+1)/2+j order (the
  * covariance / PCA product generator).
  */
final case class TriProductsExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType)
  override protected def nullSafeEval(a: Any): Any =
    VectorsTri.triProducts(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorsTri.triProducts($a)")
  override def prettyName: String = "graft_tri_products"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
