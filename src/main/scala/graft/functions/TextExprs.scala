package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the dedup/fingerprint family (scale/TextOps,
  * scale/NearDup).
  *
  * The higher-order-function forms (split → sequence → transform →
  * concat_ws → array_distinct, then one `transform` per MinHash function)
  * evaluate interpreted, materialize every intermediate array, and pay the
  * Invoke overhead per element. These kernels do the same arithmetic in one
  * fused pass per document — identical values (the DuckDB oracle SQL is
  * generated from the same constants), 100 TB-relevant because the per-doc
  * constant factor is the entire cost of a signature scan.
  */
object TextKernels {

  /** = TextOps.P; duplicated here so the kernels stay dependency-free. */
  val P: Long = 1000000007L

  /** Second independent modulus for double-hashed window keys. */
  val P2: Long = 998244353L

  /** MinHash signature width (shared source of truth with NearDup). */
  val MinhashK = 8

  /** Affine MinHash parameters h_i(x) = (a_i * x + b_i) mod P. */
  val minhashA: Array[Long] =
    Array.tabulate(MinhashK)(i => ((i + 1) * 2654435761L + 1) % P)
  val minhashB: Array[Long] =
    Array.tabulate(MinhashK)(i => (i.toLong * 40503L + 17) % P)

  /** Rolling poly-hash over code points, seed 7 (= Hashing.polyHash on a
    * java String).
    */
  def polyHashString(s: String, mod: Long): Long = {
    var h = 7L % mod
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Packed double-hash keys of every fixed-width character window at a
    * given stride — the fused form of
    * `polyHash(substr(text, p+1, w), P) * 2^31 + polyHash(substr(...), P2)`
    * per window. One O(n) pass: code-point prefix hashes under both
    * moduli, then each window key is two multiply-subtract-mod steps
    * instead of re-hashing w characters (8n → n arithmetic ops per doc at
    * w/s = 4). Identity (seed 7, base 31) proven against the composed
    * form in KernelPropertySpec; the DuckDB oracle replays the composed
    * spelling.
    */
  def windowKeys(text: UTF8String, w: Int, s: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    if (n < w || w <= 0 || s <= 0) return new GenericArrayData(Array.emptyLongArray)
    val m1 = P
    val m2 = P2
    // prefix(i) = fold of the first i code points from seed 0, mod m
    val pre1 = new Array[Long](n + 1)
    val pre2 = new Array[Long](n + 1)
    var i = 0
    while (i < n) {
      pre1(i + 1) = (pre1(i) * 31 + cps(i)) % m1
      pre2(i + 1) = (pre2(i) * 31 + cps(i)) % m2
      i += 1
    }
    var pow1 = 1L
    var pow2 = 1L
    i = 0
    while (i < w) { pow1 = pow1 * 31 % m1; pow2 = pow2 * 31 % m2; i += 1 }
    val cnt = (n - w) / s + 1
    val out = new Array[Long](cnt)
    var k = 0
    while (k < cnt) {
      val p = k * s
      val h1 = ((7L % m1) * pow1 + pre1(p + w) - pre1(p) * pow1 % m1 + m1) % m1
      val h2 = ((7L % m2) * pow2 + pre2(p + w) - pre2(p) * pow2 % m2 + m2) % m2
      out(k) = h1 * 2147483648L + h2
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Poly-hashes of the distinct word n-gram shingles of `text` — the fused
    * form of `transform(TextOps.shingles(text, n), polyHash)`: same
    * tokenization (`split(" ", -1)`, trailing empties kept, matching Spark's
    * `split`), same "short doc yields its full token join" rule, distinct on
    * the shingle STRING (first occurrence order) before hashing.
    */
  def shingleHashes(text: UTF8String, n: Int, mod: Long): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = polyHashString(it.next(), mod)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** 1-based token positions where `phrase`'s tokens match consecutively
    * in `text` (whitespace tokenization, exact token equality — the
    * positional-index phrase-search kernel; overlapping matches all
    * reported). One linear pass, no per-position array re-indexing.
    */
  /** Unicode NFC (canonical composition) — fast-path: already-normalized
    * (e.g. pure-ASCII) strings return the input without re-encoding.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def phrasePositions(text: UTF8String, phrase: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val p = phrase.toString.split(" ", -1)
    val out = new java.util.ArrayList[AnyRef]()
    if (p.nonEmpty && p.length <= toks.length) {
      var i = 0
      val last = toks.length - p.length
      while (i <= last) {
        var j = 0
        var ok = true
        while (ok && j < p.length) {
          if (toks(i + j) != p(j)) ok = false
          j += 1
        }
        if (ok) out.add(java.lang.Integer.valueOf(i + 1))
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** The distinct shingle STRINGS themselves (same tokenization/distinct
    * rules as [[shingleHashes]]) — for the exact string-keyed Jaccard
    * baseline, where the downstream oracle intersects strings.
    */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }

  /** All K MinHash minima in one pass over the shingle hashes (= K
    * `array_min(transform(...))` columns). An empty input yields the
    * identity signature (Long.MaxValue per row) — callers never produce one
    * (every document has at least one shingle).
    */
  def minhashSig(hashes: ArrayData): ArrayData = {
    val m = hashes.numElements()
    val sig = Array.fill(MinhashK)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val x = hashes.getLong(i)
      var k = 0
      while (k < MinhashK) {
        val v = (minhashA(k) * x + minhashB(k)) % P
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 32-bit SimHash over whitespace tokens in one pass: token hash mod
    * `mod`, ±1 vote per bit, bit set when votes are positive. Same values
    * as the explode + bit-vote aggregation (and its DuckDB oracle), with no
    * shuffle at all.
    */
  def simhash32(text: UTF8String, mod: Long): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](32)
    var i = 0
    while (i < toks.length) {
      val th = polyHashString(toks(i), mod)
      var b = 0
      while (b < 32) {
        if (((th >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) res |= 1L << b
      b += 1
    }
    res
  }

  /** Winnowing fingerprints (Schleimer et al. 2003) in one fused pass:
    * positional word k-gram poly-hashes, then the min of each w-long
    * window, deduplicated in first-occurrence order. Values identical to
    * the HOF composition (positional transform + windowed array_min +
    * array_distinct — kept spec-cross-checked in TextOps
    * .winnowFingerprintsHof) and to the DuckDB oracle generated from the
    * same constants. The HOF form re-slices the token and hash arrays per
    * element (O(n·k + n·w) array allocations, interpreted); this is one
    * allocation-free scan per document.
    */
  def winnow(text: UTF8String, k: Int, w: Int, mod: Long): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val nGrams = math.max(toks.length - (k - 1), 1)
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val end = math.min(i + k, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      hs(i) = polyHashString(sb.toString, mod)
      i += 1
    }
    val nWins = math.max(nGrams - (w - 1), 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j2 = 0
    while (j2 < nWins) {
      val end = math.min(j2 + w, nGrams)
      var m = hs(j2)
      var t = j2 + 1
      while (t < end) {
        if (hs(t) < m) m = hs(t)
        t += 1
      }
      seen.add(m)
      j2 += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) {
      out(z) = it.next()
      z += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document n-gram repetition statistic: [total n-grams (multiset),
    * top n-gram count] in one pass. Counting is by exact gram string (a
    * per-doc hash map), so the values match a string-keyed explode +
    * count exactly — no hash-collision drift against the oracle.
    */
  def ngramRep(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(toks.length - (n - 1), 1)
    val freq = new java.util.HashMap[String, Int]()
    var top = 0
    var i = 0
    while (i < count) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val c = freq.merge(sb.toString, 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array[Long](count.toLong, top.toLong))
  }

  /** Adjacent code-point bigram codes: element j = cp_j · 0x110000 + cp_{j+1}
    * (0x110000 = the Unicode code-point count, so the packing is
    * collision-free). One fused pass per document — the HOF spelling
    * (`transform(sequence(…), i -> substring(text, i, 2))`) evaluates
    * interpreted per character AND materializes a 2-char string per
    * position; this emits longs straight into the consuming count
    * aggregate, so the entropy scan's per-byte constant factor collapses.
    */
  def bigramCodes(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val buf = scala.collection.mutable.ArrayBuilder.make[Long]
    buf.sizeHint(n - 1)
    var i = 0
    var prev = -1
    while (i < n) {
      val cp = s.codePointAt(i)
      if (prev >= 0) buf += prev.toLong * 0x110000L + cp
      prev = cp
      i += Character.charCount(cp)
    }
    new GenericArrayData(buf.result())
  }
}

/** `graft_bigram_codes(text)`: adjacent code-point bigram codes in one
  * fused pass — the integer key feed for byte/char-bigram statistics.
  */
final case class BigramCodesExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextKernels.bigramCodes(t.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextKernels.bigramCodes($t)")
  override def prettyName: String = "graft_bigram_codes"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_shingle_hashes(text, n, mod)`: distinct word n-gram shingle
  * poly-hashes of a string.
  */
final case class ShingleHashesExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, n: Any, m: Any): Any =
    TextKernels.shingleHashes(
      t.asInstanceOf[UTF8String], n.asInstanceOf[Number].intValue,
      m.asInstanceOf[Number].longValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, m) => s"graft.functions.TextKernels.shingleHashes($t, $n, $m)")
  override def prettyName: String = "graft_shingle_hashes"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_phrase_positions(text, phrase)`: 1-based token positions of
  * consecutive exact phrase matches.
  */
final case class PhrasePositionsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(t: Any, p: Any): Any =
    TextKernels.phrasePositions(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p) => s"graft.functions.TextKernels.phrasePositions($t, $p)")
  override def prettyName: String = "graft_phrase_positions"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_shingles(text, n)`: distinct word n-gram shingles of a string. */
final case class ShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.shingleStrings(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.TextKernels.shingleStrings($t, $n)")
  override def prettyName: String = "graft_shingles"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_minhash_sig(shingle_hashes)`: the K-wide MinHash signature. */
final case class MinHashSigExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(hashes: Any): Any =
    TextKernels.minhashSig(hashes.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h => s"graft.functions.TextKernels.minhashSig($h)")
  override def prettyName: String = "graft_minhash_sig"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `graft_ngram_rep(text, n)`: [total multiset n-grams, top n-gram count]
  * — the per-document repetition statistic as one native pass (a per-doc
  * stat needs no gram explode/shuffle at any scale).
  */
final case class NgramRepExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, n: Any): Any =
    TextKernels.ngramRep(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.TextKernels.ngramRep($t, $n)")
  override def prettyName: String = "graft_ngram_rep"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_winnow(text, k, w, mod)`: winnowing fingerprints — distinct
  * windowed minima of positional k-gram hashes, one fused pass.
  */
final case class WinnowExpr(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, k: Any, w: Any, m: Any): Any =
    TextKernels.winnow(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Number].intValue, w.asInstanceOf[Number].intValue,
      m.asInstanceOf[Number].longValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k, w, m) => s"graft.functions.TextKernels.winnow($t, $k, $w, $m)")
  override def prettyName: String = "graft_winnow"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `graft_window_keys(text, w, stride)`: packed double-hash key per
  * fixed-width character window (rolling-hash fused pass; mods = P, P2).
  */
final case class WindowKeysExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, w: Any, s: Any): Any =
    TextKernels.windowKeys(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Number].intValue, s.asInstanceOf[Number].intValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, w, s) => s"graft.functions.TextKernels.windowKeys($t, $w, $s)")
  override def prettyName: String = "graft_window_keys"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** `graft_simhash32(text, mod)`: 32-bit SimHash of a string's tokens. */
final case class SimHash32Expr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any, m: Any): Any =
    TextKernels.simhash32(t.asInstanceOf[UTF8String],
      m.asInstanceOf[Number].longValue)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.TextKernels.simhash32($t, $m)")
  override def prettyName: String = "graft_simhash32"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_nfc(text)`: Unicode NFC normalization (UTS #15 canonical
  * composition) via `java.text.Normalizer` — the same normal form DuckDB's
  * `nfc_normalize` (utf8proc) produces, so NFC output is oracle-hashable.
  * The standard first step of an LLM text-prep pipeline: decomposed
  * accents, compatibility variants of the same glyph sequence, and
  * mixed-source corpora otherwise make byte-level dedup misses out of
  * visually identical text.
  */
final case class NfcExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    TextKernels.nfc(s.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.nfc($s)")
  override def prettyName: String = "graft_nfc"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
