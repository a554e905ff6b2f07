package graft

import graft.ops.SketchOps
import graft.ops.SketchOps.MisraGries

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary keeps every item above n/(k+1) — the recall guarantee") {
    // deterministic skewed stream: item i gets ~n/2^i occurrences, plus a
    // long tail of singletons to pressure the counters
    val heavy = (1 to 6).flatMap(i => Seq.fill(1 << (10 - i))(s"h$i"))
    val tail = (1 to 300).map(i => s"t$i")
    val stream = new scala.util.Random(42).shuffle((heavy ++ tail).toVector)
    val n = stream.size
    val k = 16
    // run through the Dataset path with several partitions so reduce AND
    // merge both execute
    val cands = stream.toDS().repartition(7)
      .select(new MisraGries(k).toColumn)
      .collect().flatten.toSet
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter(_._2 > n.toDouble / (k + 1)).keySet
    assert(mustKeep.nonEmpty, "test stream must contain true heavy hitters")
    assert(mustKeep.subsetOf(cands),
      s"missing guaranteed heavy hitters: ${mustKeep -- cands}")
    assert(cands.size <= k, s"summary exceeded capacity: ${cands.size} > $k")
  }

  test("MG merge bounds the summary at capacity and preserves heavy entries") {
    val mg = new MisraGries(3)
    val a = Map("x" -> 100L, "y" -> 5L, "z" -> 4L)
    val b = Map("x" -> 50L, "w" -> 6L, "v" -> 3L)
    val m = mg.merge(a, b)
    assert(m.size <= 3)
    assert(m.contains("x") && m("x") <= 150L && m("x") >= 150L - 5L)
  }

  test("q64 two-pass output equals the exact group-by computation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = SketchOps.heavyHitters(docs)
      .as[(String, Long)].collect().toSeq
    val tokens = docs.selectExpr("explode(split(text, ' ')) AS token")
    val n = tokens.count()
    val exact = tokens.groupBy("token").count()
      .filter($"count" > n / 50.0)
      .orderBy($"count".desc, $"token")
      .as[(String, Long)].collect().toSeq
    assert(got === exact)
    assert(got.nonEmpty, "corpus should surface at least one heavy token")
  }

  test("heavyHitters rejects a capacity below the recall requirement") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      SketchOps.heavyHitters(docs, capacity = 10, thresholdInv = 50)
    }
  }
}
