package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) evaluates a
  * lambda interpreter per element; this expression compiles to a tight Java
  * loop inside whole-stage codegen. Accumulation is left-to-right from 0.0
  * — the exact IEEE sequence of the HOF fold and of the DuckDB oracle's
  * explicit chain, so swapping implementations cannot change results.
  *
  * Null handling: null array → null; MISMATCHED lengths → null (a ragged
  * pair is data corruption — surfacing null matches the oracle's
  * out-of-range list indexing instead of silently truncating to the
  * shorter array). Null *elements* are treated as 0 contribution.
  *
  * Preference order per the engine's design rules: built-in ops first, a
  * custom `Expression` only where measurably better — this is the §7.4
  * "codegen Expression for cosine similarity" case from SURVEY.md.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred as Seq[ArrayType] — AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged input → null
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  // identifiers MUST be freshName'd: with non-nullable children,
  // nullSafeExec adds no brace scope, so two graft_dot calls in one
  // projection would otherwise redeclare the same Java locals — Janino
  // fails and Spark silently falls back to interpreted eval
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $acc += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Consecutive n-gram word shingles over a token array.
  *
  * Why a custom expression: composing this from built-ins either re-inlines
  * the `split(text)` child into every element access (`transform(sequence,
  * i -> element_at(split, i)...)` — O(tokens²) per doc after Catalyst's
  * project-collapse) or needs a `lead()` window (an extra shuffle + sort per
  * use). As a unary expression the tokenization child is evaluated ONCE per
  * row and the shingles build in one linear pass — no shuffle, no quadratic
  * blowup. Interpreted eval only (`CodegenFallback`): the loop allocates
  * arrays of strings, which codegen cannot beat meaningfully.
  *
  * Fewer than `n` tokens → empty array (the doc simply yields no shingles).
  * Null TOKENS (possible on arbitrary SQL-supplied arrays — `split` never
  * produces them) are substituted with the empty string, so the declared
  * `containsNull = false` output contract holds for any input.
  */
case class ShingleArray(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = arr.numElements()
    if (num < n) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
      val empty = org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
      val out = new Array[Any](num - n + 1)
      var i = 0
      while (i <= num - n) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
        var j = 0
        while (j < n) {
          if (j > 0) parts(2 * j - 1) = sep
          // null token → "" so the containsNull=false output contract holds
          // (UTF8String.concat returns null if ANY part is null)
          val t = if (arr.isNullAt(i + j)) empty else arr.getUTF8String(i + j)
          parts(2 * j) = t
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.concat(parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer twin of [[DotProduct]]: dot product over two ARRAY<BIGINT>
  * columns in exact int64 arithmetic (the hyperplane-LSH band keys dot
  * 1e-6-quantized vectors against integer planes — associative, so unlike
  * the double version no fold-order caveat applies; overflow wraps like
  * the `aggregate(zip_with(...))` HOF form it replaces, unreachable at the
  * quantizations used). Same null/ragged contract as the double version. */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(org.apache.spark.sql.types.LongType),
    ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true // ragged input → null
  override def prettyName: String = "graft_dotl"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotlN")
      val acc = ctx.freshName("dotlAcc")
      val i = ctx.freshName("dotlI")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $acc += $a.getLong($i) * $b.getLong($i);
         |    }
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SimHash over a token array: per token, the 60-bit hash is the first 15
  * hex chars of md5 (= the top 60 bits of the digest, identical to
  * `conv(substring(md5(t),1,15),16,10)`); each bit votes +1/-1 and the
  * majority sets the output bit.
  *
  * Why a custom expression: the composed form explodes every token to a
  * row and runs a `bits`-wide SUM aggregate — the votes cross a shuffle as
  * 8·bits bytes of partials per document, and the exploded token rows (the
  * corpus itself) must materialize. Per document the simhash is a pure
  * row-local fold, so this expression removes the explode AND the shuffle
  * entirely: one md5 per distinct token, one vote array on the stack.
  * Matches the aggregate form bit-for-bit (same hash slice, same strict
  * `> 0` majority, ties → 0; a null TOKEN votes -1 on every bit, exactly
  * like the aggregate's `WHEN null THEN ... OTHERWISE -1` branch).
  * `CodegenFallback`: md5 dominates, a generated loop adds nothing.
  */
case class SimHash64(child: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bits >= 1 && bits <= 60, "simhash bits must be in [1, 60] (15 md5 hex chars)")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    val md = java.security.MessageDigest.getInstance("MD5") // reused per row
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < bits) { votes(j) -= 1; j += 1 } // null hash: every bit-test fails
      } else {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        // first 15 hex chars = bytes 0-6 plus the high nibble of byte 7
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
        h = (h << 4) | ((d(7) >> 4) & 0xFL)
        var j = 0
        while (j < bits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a (distinct) shingle array: element k of the
  * result is `min over shingles of md5Hex("k:" + shingle)` — byte-wise min
  * over lowercase hex strings, identical to the SQL `min(md5(concat()))`
  * aggregate and to the DuckDB `list_min(list_transform(...))` oracle form.
  *
  * Why a custom expression: the aggregate form explodes every shingle to a
  * row and runs a k-wide MIN hash-aggregate — the exploded shingle rows
  * (≈ the corpus) materialize and the per-doc partials cross a shuffle.
  * The signature is a pure row-local fold, so this computes it in one pass
  * per document with zero shuffle; the md5 work (k per distinct shingle)
  * is identical in both forms. Empty input → null (callers filter, which
  * matches the aggregate form silently dropping shingle-less docs).
  * `CodegenFallback`: md5 dominates. */
case class MinHashSignature(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1, "minhash family size must be >= 1")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set → null
  override def prettyName: String = "graft_minhash"

  // per-salt prefix bytes, computed once per expression instance
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(i => (i.toString + ":").getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // track raw 16-byte digests: unsigned byte order == lowercase-hex
    // string order, so only the k winners pay the hex conversion
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      // null shingles cannot occur from the shingle generator; md5(null)
      // is null in SQL and MIN skips nulls — so skipping matches exactly
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).getBytes
        var kk = 0
        while (kk < k) {
          md.reset()
          md.update(salts(kk))
          md.update(s)
          val d = md.digest()
          val cur = mins(kk)
          if (cur == null || java.util.Arrays.compareUnsigned(d, cur) < 0) mins(kk) = d
          kk += 1
        }
      }
      i += 1
    }
    if (mins(0) == null) return null // all-null shingle array: MIN over nulls
    val out = new Array[Any](k)
    var kk = 0
    while (kk < k) {
      out(kk) = org.apache.spark.unsafe.types.UTF8String.fromString(
        org.apache.commons.codec.binary.Hex.encodeHexString(mins(kk)))
      kk += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All hyperplane-LSH band keys of a 1e-6-quantized vector in ONE pass:
  * element b of the result is the band-b key — `(b << planesPerBand)` plus
  * a sign bit per plane, where plane g = b·planesPerBand + p has integer
  * weights `((1009·g + 31·d + 7) % 19) − 9` (the [[graft.ops.SimilarityOps]]
  * formula, identical to the SQL arithmetic the DuckDB oracle runs).
  *
  * Why a custom expression: the composed form is bands × planes CASE'd
  * `graft_dotl` calls, each against a dim-length LITERAL array — at the
  * default 4×8 geometry that is 32 dot expressions × 64 literal nodes per
  * projection, paid in analysis/codegen time AND as 32 separate array
  * walks per row. This computes all keys in one dims×planes loop with the
  * plane weight generated arithmetically — no literals, one array walk per
  * plane, codegen'd. Exactness is unchanged: the dot is associative int64
  * arithmetic, bit-identical to the dotl form (cross-checked in
  * `DotProductSpec`). Null vector → null; null ELEMENTS contribute 0
  * (exactly the dotl null-skip). */
case class HyperplaneBands(child: Expression, bands: Int, planesPerBand: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(bands >= 1 && planesPerBand >= 1 && planesPerBand <= 62,
    "graft_bands needs bands >= 1 and 1 <= planesPerBand <= 62")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_bands"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dims = v.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var key = b.toLong << planesPerBand
      var p = 0
      while (p < planesPerBand) {
        val g = b * planesPerBand + p
        var dot = 0L
        var d = 0
        while (d < dims) {
          if (!v.isNullAt(d))
            dot += v.getLong(d) * (((1009L * g + 31L * d + 7L) % 19L) - 9L)
          d += 1
        }
        if (dot > 0L) key += (1L << p)
        p += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val dims = ctx.freshName("hbDims")
      val keys = ctx.freshName("hbKeys")
      val b = ctx.freshName("hbB")
      val p = ctx.freshName("hbP")
      val g = ctx.freshName("hbG")
      val dot = ctx.freshName("hbDot")
      val d = ctx.freshName("hbD")
      val key = ctx.freshName("hbKey")
      s"""
         |int $dims = $v.numElements();
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = ((long) $b) << $planesPerBand;
         |  for (int $p = 0; $p < $planesPerBand; $p++) {
         |    int $g = $b * $planesPerBand + $p;
         |    long $dot = 0L;
         |    for (int $d = 0; $d < $dims; $d++) {
         |      if (!$v.isNullAt($d)) {
         |        $dot += $v.getLong($d) * (((1009L * $g + 31L * $d + 7L) % 19L) - 9L);
         |      }
         |    }
         |    if ($dot > 0L) $key += (1L << $p);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al. 2003) over a text
  * column: hash every K-char k-gram to 60 bits (first 15 md5 hex chars —
  * the same slice as `conv(substring(md5(g),1,15),16,10)`), slide a W-hash
  * window, select each full window's minimum with RIGHTMOST tie-break, and
  * return the distinct selected hashes sorted ascending.
  *
  * Why a custom expression: the composed form explodes every character
  * position to a row (≈ corpus bytes), shuffles them all into a per-doc
  * window sort for the sliding MIN, then pays a global distinct shuffle to
  * collapse selections to the fingerprint set. The whole selection is a
  * pure row-local fold, so this computes it in one linear pass per
  * document — no window shuffle, no distinct shuffle; only the ~2/(W+1)
  * surviving fingerprints ever leave the row. Bit-equal to the windowed
  * `MIN(struct(h, -p))` + DISTINCT form (the spec proves it), which is
  * also what the DuckDB oracle runs. k-grams are CHARACTER-based
  * (`UTF8String.substringSQL` semantics, matching SQL substring in both
  * engines). Texts shorter than K+W-1 chars have no full window → empty
  * array. `CodegenFallback`: md5 dominates. */
case class WinnowHashes(child: Expression, k: Int, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1 && w >= 1, "k-gram width and window must be >= 1")
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val nChars = text.numChars()
    val n = nChars - k + 1 // gram count
    if (n < w) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      // substringSQL is 1-based char-indexed — identical to SQL substring
      md.update(text.substringSQL(i + 1, k).getBytes)
      val d = md.digest()
      // first 15 hex chars = bytes 0-6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      hs(i) = (h << 4) | ((d(7) >> 4) & 0xFL)
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    var e = w - 1
    while (e < n) {
      var best = e - w + 1
      var j = best + 1
      while (j <= e) {
        if (hs(j) <= hs(best)) best = j // <= → rightmost minimal survives
        j += 1
      }
      sel.add(hs(best))
      e += 1
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Code-point hamming distance from a 1-based start position — q177's
  * bulk filter (`hamming ≥ 3` separates the shift pairs from the
  * hamming-2 spine).
  *
  * Why a custom expression: the SQL spelling is a higher-order
  * `aggregate` over `substring` calls — interpreted per element, two
  * UTF8String allocations per position, measured at ~136 µs/row on
  * 18-char names (it dominated q177's candidate pass). This codegen'd
  * loop walks both strings once with zero allocation beyond the two
  * `toString`s. Positions are Unicode CODE POINTS, matching Spark's
  * `substring`/`length` semantics so the expression agrees with the SQL
  * form on every input, not just ASCII. Unequal code-point lengths →
  * null (the q177 join guarantees equal lengths; null fails any filter,
  * surfacing misuse instead of fabricating a distance). */
case class HammingFrom(left: Expression, right: Expression, start: Int)
  extends BinaryExpression with ImplicitCastInputTypes {
  require(start >= 1, "graft_hamming start position is 1-based")

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = HammingFrom.compute(a.toString, b.toString, start)
    if (r < 0) null else r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val h = ctx.freshName("hamH")
      s"""
         |int $h = graft.expressions.HammingFrom.compute(
         |  $a.toString(), $b.toString(), $start);
         |if ($h < 0) { ${ev.isNull} = true; } else { ${ev.value} = $h; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingFrom {
  /** -1 = unequal code-point length; otherwise diffs at positions ≥
    * `start` (1-based code points). Shared by eval and codegen. */
  def compute(sa: String, sb: String, start: Int): Int = {
    var ia = 0
    var ib = 0
    var pos = 1
    var h = 0
    while (ia < sa.length && ib < sb.length) {
      val ca = sa.codePointAt(ia)
      val cb = sb.codePointAt(ib)
      if (pos >= start && ca != cb) h += 1
      ia += Character.charCount(ca)
      ib += Character.charCount(cb)
      pos += 1
    }
    if (ia < sa.length || ib < sb.length) -1 else h
  }
}

/** Function registration, both as a `SparkSessionExtensions` hook
  * (`.withExtensions(new GraftExtensions)`) and as an idempotent imperative
  * call for sessions the library does not construct. */
object GraftFunctions {
  private val dotIdent = FunctionIdentifier("graft_dot")
  private val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  private val shinglesIdent = FunctionIdentifier("graft_shingles")
  private val shinglesInfo = new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles")
  private val shinglesBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2 && children(1).foldable,
      "graft_shingles(tokens, n) takes an array and a literal shingle size")
    ShingleArray(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }

  private val dotlIdent = FunctionIdentifier("graft_dotl")
  private val dotlInfo = new ExpressionInfo(classOf[DotProductLong].getName, "graft_dotl")
  private val dotlBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dotl takes exactly 2 arguments")
    DotProductLong(children.head, children(1))
  }

  private val minhashIdent = FunctionIdentifier("graft_minhash")
  private val minhashInfo = new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash")
  private val minhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2 && children(1).foldable,
      "graft_minhash(shingles, k) takes an array and a literal family size")
    MinHashSignature(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }

  private val bandsIdent = FunctionIdentifier("graft_bands")
  private val bandsInfo = new ExpressionInfo(classOf[HyperplaneBands].getName, "graft_bands")
  private val bandsBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 3 && children(1).foldable && children(2).foldable,
      "graft_bands(vq, bands, planesPerBand) takes an array and two literal ints")
    HyperplaneBands(children.head,
      children(1).eval().asInstanceOf[Number].intValue(),
      children(2).eval().asInstanceOf[Number].intValue())
  }

  private val simhashIdent = FunctionIdentifier("graft_simhash")
  private val simhashInfo = new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash")
  private val simhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2 && children(1).foldable,
      "graft_simhash(tokens, bits) takes an array and a literal bit width")
    SimHash64(children.head, children(1).eval().asInstanceOf[Number].intValue())
  }

  private val winnowIdent = FunctionIdentifier("graft_winnow")
  private val winnowInfo = new ExpressionInfo(classOf[WinnowHashes].getName, "graft_winnow")
  private val winnowBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 3 && children(1).foldable && children(2).foldable,
      "graft_winnow(text, k, w) takes a string and two literal ints")
    WinnowHashes(children.head,
      children(1).eval().asInstanceOf[Number].intValue(),
      children(2).eval().asInstanceOf[Number].intValue())
  }

  private val hammingIdent = FunctionIdentifier("graft_hamming")
  private val hammingInfo = new ExpressionInfo(classOf[HammingFrom].getName, "graft_hamming")
  private val hammingBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 3 && children(2).foldable,
      "graft_hamming(a, b, start) takes two strings and a literal 1-based start")
    HammingFrom(children.head, children(1),
      children(2).eval().asInstanceOf[Number].intValue())
  }

  private val trisumIdent = FunctionIdentifier("graft_trisum")
  private val trisumInfo = new ExpressionInfo(classOf[TriangleSumAgg].getName, "graft_trisum")
  private val trisumBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2 && children(1).foldable,
      "graft_trisum(qv, dim) takes an array and a literal dimension")
    TriangleSumAgg(children.head,
      children(1).eval().asInstanceOf[Number].intValue())
      .toAggregateExpression()
  }

  def registerAll(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((trisumIdent, trisumInfo, trisumBuilder))
    ext.injectFunction((dotIdent, dotInfo, dotBuilder))
    ext.injectFunction((shinglesIdent, shinglesInfo, shinglesBuilder))
    ext.injectFunction((simhashIdent, simhashInfo, simhashBuilder))
    ext.injectFunction((minhashIdent, minhashInfo, minhashBuilder))
    ext.injectFunction((dotlIdent, dotlInfo, dotlBuilder))
    ext.injectFunction((bandsIdent, bandsInfo, bandsBuilder))
    ext.injectFunction((winnowIdent, winnowInfo, winnowBuilder))
    ext.injectFunction((hammingIdent, hammingInfo, hammingBuilder))
  }

  /** Idempotent: safe to call from every query builder. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(trisumIdent, trisumInfo, trisumBuilder)
    spark.sessionState.functionRegistry.registerFunction(dotIdent, dotInfo, dotBuilder)
    spark.sessionState.functionRegistry.registerFunction(shinglesIdent, shinglesInfo, shinglesBuilder)
    spark.sessionState.functionRegistry.registerFunction(simhashIdent, simhashInfo, simhashBuilder)
    spark.sessionState.functionRegistry.registerFunction(minhashIdent, minhashInfo, minhashBuilder)
    spark.sessionState.functionRegistry.registerFunction(dotlIdent, dotlInfo, dotlBuilder)
    spark.sessionState.functionRegistry.registerFunction(bandsIdent, bandsInfo, bandsBuilder)
    spark.sessionState.functionRegistry.registerFunction(winnowIdent, winnowInfo, winnowBuilder)
    spark.sessionState.functionRegistry.registerFunction(hammingIdent, hammingInfo, hammingBuilder)
  }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.registerAll(ext)
}
