package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document sketch kernels for the dedup family (SURVEY.md
  * §2.J). The higher-order-function formulations in
  * [[graft.functions.TextFns]] are semantically right but interpreted:
  * a MinHash signature evaluates |shingles|·k lambda calls per row, a
  * SimHash 64·|words| — at 100 TB that interpretation IS the job. Each
  * kernel here is one static JVM call per row (whole-stage codegen
  * emits a single invocation), with the arithmetic in tight primitive
  * loops.
  *
  * Bit-parity contract: every hash goes through Spark's own
  * [[XxHash64Function]] (seed 42, the `xxhash64` builtin), and shingles
  * are joined with the same separator `concat_ws`/`array_join` use —
  * so the kernels produce bit-identical values to the HOF forms, which
  * the PipelineSpec cross-checks row-for-row.
  */
object TextKernels {

  /** Spark's default xxhash64 seed (`XxHash64.seed`). */
  val Seed = 42L

  private val Space = UTF8String.fromString(" ")

  private def hashString(s: UTF8String): Long =
    XXH64.hashUTF8String(s, Seed)

  /** Per-permutation seeds: `xxhash64(i, h)` folds as
    * `hashLong(h, hashInt(i, 42))`, so `hashInt(i, 42)` is a constant
    * per permutation — hoisted out of the row loop.
    */
  def minhashSeeds(k: Int): Array[Long] = {
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) { seeds(i) = XXH64.hashInt(i, Seed); i += 1 }
    seeds
  }

  /** MinHash signature over n-word shingles of `words`.
    *
    * Matches `minhashSignature(shingleHashes(text, n), k)` exactly:
    * shingle strings are the words `i..i+n-1` joined by a space (docs
    * shorter than n shingle into their full text), hashed with seeded
    * xxhash64; `array_distinct` in the HOF path is dropped here because
    * duplicates cannot change a minimum.
    */
  def minhashWords(words: ArrayData, n: Int, seeds: Array[Long]): Array[Long] = {
    val k = seeds.length
    val acc = new Array[Long](k)
    java.util.Arrays.fill(acc, Long.MaxValue)
    val nw = words.numElements()
    val width = if (nw >= n) n else nw
    val nShingles = if (nw >= n) nw - n + 1 else 1
    val buf = new Array[UTF8String](width)
    var s = 0
    while (s < nShingles) {
      var j = 0
      while (j < width) { buf(j) = words.getUTF8String(s + j); j += 1 }
      val h = hashString(UTF8String.concatWs(Space, buf: _*))
      var i = 0
      while (i < k) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < acc(i)) acc(i) = v
        i += 1
      }
      s += 1
    }
    acc
  }

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken's MOSS
    * algorithm): the rolling polynomial hash of every k-byte gram, then
    * the rightmost minimum of each w-hash window, deduplicated — the
    * guarantee is that any match of length ≥ k + w − 1 between two
    * documents shares at least one selected fingerprint, at a bounded
    * ~2/(w+1) selection density. Output is the sorted distinct selected
    * hashes (a set — deterministic, join-ready).
    *
    * The rolling recurrence (h·B + b, with the leading term subtracted
    * on slide) runs in Java long arithmetic — wraparound semantics,
    * immune to Spark's ANSI overflow checking, O(len) per document.
    * Documents shorter than k fingerprint as their whole text.
    */
  def winnow(text: UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    val B = 1000003L // polynomial base (prime, well-mixed under mod 2^64)
    if (n < k) return Array(hashString(text))
    val nGrams = n - k + 1
    val grams = new Array[Long](nGrams)
    var bk = 1L // B^(k-1)
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    grams(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xffL) * bk) * B + (bytes(i + k - 1) & 0xffL)
      grams(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      // single window over all grams: rightmost minimum
      var min = grams(0); var at = 0; var g = 1
      while (g < nGrams) { if (grams(g) <= min) { min = grams(g); at = g }; g += 1 }
      selected.add(grams(at))
    } else {
      var start = 0
      while (start + w <= nGrams) {
        var min = grams(start); var at = start; var g = start + 1
        while (g < start + w) { if (grams(g) <= min) { min = grams(g); at = g }; g += 1 }
        selected.add(grams(at))
        start += 1
      }
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  /** 64-bit SimHash over the word multiset: per-bit votes (+1/-1) from
    * each word's xxhash64, sign of the vote becomes the bit. Matches
    * `TextFns.simhashExpr` over `transform(words, xxhash64)` exactly.
    */
  def simhashWords(words: ArrayData): Long = {
    val votes = new Array[Int](64)
    val nw = words.numElements()
    var w = 0
    while (w < nw) {
      val h = hashString(words.getUTF8String(w))
      var i = 0
      while (i < 64) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      w += 1
    }
    var sh = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sh |= 1L << i; i += 1 }
    sh
  }

  private val Md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit MD5 SimHash over the word multiset — the ENGINE-REPLICABLE
    * simhash backing q_dedup_simhash's oracle promotion. The per-word
    * hash is the top 60 bits of md5(word): exactly the value a SQL
    * engine with only `md5` + integer bit ops rebuilds as
    * `('0x' || substring(md5(w), 1, 15))::BIGINT` (both engines' md5
    * agree on UTF-8 input; 15 hex chars = first-8-bytes-big-endian
    * >>> 4). 60 bits, not 64, so the hex-parsed value stays inside a
    * SIGNED 64-bit integer on any engine. Same sign-of-votes
    * construction as [[simhashWords]]; the xxhash64 64-bit variant
    * stays as the cheap non-verifiable path (one xxhash64 vs one md5
    * per word occurrence).
    */
  def simhash60Words(words: ArrayData): Long = {
    val md = Md5Local.get()
    val votes = new Array[Int](60)
    val nw = words.numElements()
    var w = 0
    while (w < nw) {
      md.reset()
      val d = md.digest(words.getUTF8String(w).getBytes)
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = h >>> 4
      var i = 0
      while (i < 60) {
        if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      w += 1
    }
    var sh = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sh |= 1L << i; i += 1 }
    sh
  }

  /** Unicode normalization (java.text.Normalizer): the already-
    * normalized fast path returns the input UTF8String untouched —
    * on a real corpus almost every document is already NFC, so the
    * hot loop is one `isNormalized` scan with zero allocation.
    */
  def unicodeNormalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

private[expressions] trait WordsArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }
}

/** `minhash_words(words, n, k)` — k-permutation MinHash signature over
  * the n-word shingles of a tokenized document. Null words → null.
  */
case class MinHashWords(child: Expression, n: Int, k: Int)
    extends UnaryExpression with WordsArrayInput {

  require(n >= 1 && k >= 1, s"minhash_words needs n,k >= 1, got n=$n k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_words"

  @transient private lazy val seeds = TextKernels.minhashSeeds(k)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(TextKernels.minhashWords(a.asInstanceOf[ArrayData], n, seeds))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.TextKernels.minhashWords($c, $n, $seedsRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashWords =
    copy(child = newChild)
}

/** `winnow_fp(text, k, w)` — winnowed rolling-hash fingerprint set of a
  * document (sorted distinct selected hashes). Null text → null.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_fp needs k,w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(TextKernels.winnow(a.asInstanceOf[UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.TextKernels.winnow($c, $k, $w));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** `simhash_words(words)` — 64-bit SimHash of a tokenized document. */
case class SimHashWords(child: Expression)
    extends UnaryExpression with WordsArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_words"

  override def nullSafeEval(a: Any): Any =
    TextKernels.simhashWords(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.simhashWords($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashWords =
    copy(child = newChild)
}

/** `simhash60_words(words)` — 60-bit MD5 SimHash of a tokenized
  * document (see [[TextKernels.simhash60Words]] for why MD5/60-bit:
  * any SQL engine can replicate it exactly, which is what lets
  * q_dedup_simhash be hash-checked against an independent oracle).
  */
case class SimHash60Words(child: Expression)
    extends UnaryExpression with WordsArrayInput {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60_words"

  override def nullSafeEval(a: Any): Any =
    TextKernels.simhash60Words(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.simhash60Words($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash60Words =
    copy(child = newChild)
}

/** `unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')` — ClickHouse's
  * `normalizeUTF8NFC`/`NFD`/`NFKC`/`NFKD` family, and the Unicode-
  * normalization cleaning step every multilingual training pipeline
  * runs before tokenization (decomposed accents and compatibility
  * ligatures otherwise split identical surface text across distinct
  * token sequences). Null text → null.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.catalogString}")
  }

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(a: Any): Any =
    TextKernels.unicodeNormalize(a.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.unicodeNormalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Shared helpers for SQL-surface function registration: literal-int
  * extraction and clean arity failure (a wrong argument count must
  * surface as an analysis-time error message, not an
  * IndexOutOfBoundsException from the builder).
  */
private[expressions] object FnReg {
  def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  def litStr(e: Expression, fn: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string, got $other")
  }

  def arity(fn: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$fn expects $n arguments, got ${exprs.length}")
      b(exprs)
    }
}

object TextExprs {
  import FnReg._

  /** Column-API entry points used by [[graft.functions.TextFns]]. */
  def minhashWords(words: Column, n: Int, k: Int): Column =
    bridge.column(MinHashWords(bridge.expression(words), n, k))

  def simhashWords(words: Column): Column =
    bridge.column(SimHashWords(bridge.expression(words)))

  def simhash60Words(words: Column): Column =
    bridge.column(SimHash60Words(bridge.expression(words)))

  def winnowFp(text: Column, k: Int, w: Int): Column =
    bridge.column(WinnowFingerprint(bridge.expression(text), k, w))

  def unicodeNormalize(text: Column, form: String): Column =
    bridge.column(UnicodeNormalize(bridge.expression(text), form))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_words"),
      new ExpressionInfo(classOf[MinHashWords].getName, "minhash_words"),
      arity("minhash_words", 3)(exprs => MinHashWords(exprs(0),
        litInt(exprs(1), "minhash_words"), litInt(exprs(2), "minhash_words")))),
    (FunctionIdentifier("simhash_words"),
      new ExpressionInfo(classOf[SimHashWords].getName, "simhash_words"),
      arity("simhash_words", 1)(exprs => SimHashWords(exprs(0)))),
    (FunctionIdentifier("simhash60_words"),
      new ExpressionInfo(classOf[SimHash60Words].getName, "simhash60_words"),
      arity("simhash60_words", 1)(exprs => SimHash60Words(exprs(0)))),
    (FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      arity("winnow_fp", 3)(exprs => WinnowFingerprint(exprs(0),
        litInt(exprs(1), "winnow_fp"), litInt(exprs(2), "winnow_fp")))),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      arity("unicode_normalize", 2)(exprs => UnicodeNormalize(exprs(0),
        litStr(exprs(1), "unicode_normalize")))))
}
