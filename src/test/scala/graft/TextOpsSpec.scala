package graft

import graft.ops.{DedupOps, TextOps}

/** Edge-case behavior of the text operators — the testdata never exercises
  * null/empty/single-token documents, but library users will. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text, "en", "s1", 0L)
  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("repetition score: template-stamped text scores 1.0, varied text low") {
    val d = docs(
      doc(1, "spam spam spam spam spam spam"),       // every 3-gram identical
      doc(2, "all tokens here are quite different"), // 4 distinct 3-grams
      doc(3, "too few"))                             // < 3 tokens: no row
    val got = TextOps.repetitionScore(d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) === 1.0)
    assert(got(2L) === 0.25)
    assert(!got.contains(3L))
  }

  test("training filter keeps plausible prose, drops unshingleable docs") {
    val prose = "the cat is a fine friend and the dog is a good pal of ours to keep in mind for sure okay"
    val d = docs(doc(1, "a b"), doc(2, prose))
    val keep = TextOps.trainingFilter(d).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(keep(1L) === false) // too short to shingle → null rep_ratio → drop
    assert(keep(2L) === true)
  }

  test("token stats: empty text yields one empty token (split semantics), null text yields nulls") {
    val d = docs(doc(1, "two words"), doc(2, ""), (3L, null, "en", "s1", 0L))
    val rows = TextOps.tokenStats(d).collect()
    assert(rows(0).getLong(1) === 2)      // "two words"
    assert(rows(1).getLong(1) === 1)      // "" splits to [""] — documented quirk
    assert(rows(2).isNullAt(1))           // null text propagates null, no crash
  }

  test("shingling: docs with < 3 tokens produce no shingles and are absent from signatures") {
    val d = docs(doc(1, "only two"), doc(2, "a b c d"))
    val sig = DedupOps.minhashSignature(d).select("doc_id").as[Long].collect()
    assert(sig.toSeq === Seq(2L))
  }

  test("language id is total: every non-null doc gets a prediction") {
    val d = docs(doc(1, "the cat"), doc(2, "der hund und das"), doc(3, "xyzzy"))
    val preds = TextOps.langId(d).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) === "en")
    assert(preds(2L) === "de")
    assert(preds(3L) === "en") // zero hits everywhere → first language by priority
  }

  test("quality score ratios stay in [0, 1]") {
    val d = docs(doc(1, "the the the"), doc(2, "zebra quark"))
    val rows = TextOps.qualityScore(d).collect()
    assert(rows(0).getDouble(3) === 1.0)
    assert(rows(1).getDouble(3) === 0.0)
  }

  test("fingerprint is order-insensitive over the bag of words") {
    val d = docs(doc(1, "b a c"), doc(2, "c b a"), doc(3, "c b x"))
    val fps = TextOps.fingerprint(d).collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }
}
