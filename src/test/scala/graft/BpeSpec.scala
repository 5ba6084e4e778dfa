package graft

import graft.pipeline.Bpe
import org.apache.spark.sql.functions._

/** BPE vocabulary training (Sennrich et al. 2016) against the paper's
  * own worked example, hand-computed — the exact-reference check the
  * rows-only `q_bpe_encode` leans on (SURVEY §5.3.4).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The classic toy grid: low×5, lower×2, newest×6, widest×3. */
  private def toyGrid = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "cnt")

  test("training reproduces the hand-computed merge sequence") {
    // pair counts by hand: (e,s)=9 (s,t)=9 (t,</w>)=9 tie → lexicographic
    // gives (e,s); then (es,t)=9, (est,</w>)=9, then the 7-tie
    // (l,o)/(o,w) → (l,o), then (lo,w)=7.
    val m = Bpe.train(toyGrid, numMerges = 5)
    assert(m.merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("a trained model tokenizes an unseen word along learned merges") {
    val m = Bpe.train(toyGrid, numMerges = 5)
    assert(m.encodeWord("lowest") == Seq("low", "est</w>"))
    // a word sharing no learned pairs stays at the char level
    assert(m.encodeWord("zq") == Seq("z", "q", "</w>"))
  }

  test("training is deterministic and stops when no pair repeats") {
    val m1 = Bpe.train(toyGrid, numMerges = 200)
    val m2 = Bpe.train(toyGrid, numMerges = 200)
    assert(m1.merges == m2.merges)
    // far fewer than 200 merges exist with count >= 2: it must stop
    assert(m1.merges.length < 40)
  }

  test("distributed and driver-local training paths learn identical models") {
    // maxLocalTypes = 0 forces the distributed loop; default takes the
    // in-memory path — same statistics, same tie-break, same model
    val local = Bpe.train(toyGrid, numMerges = 10)
    val dist = Bpe.train(toyGrid, numMerges = 10, maxLocalTypes = 0)
    assert(local.merges == dist.merges)
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 20)
    val grid = Bpe.wordTypes(docs, "text")
    assert(Bpe.train(grid, 15).merges == Bpe.train(grid, 15, maxLocalTypes = 0).merges)
  }

  test("corpus encode round-trips: concatenated tokens spell the text") {
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 30)
    val m = Bpe.train(Bpe.wordTypes(docs, "text"), numMerges = 30)
    assert(m.merges.length == 30)
    val enc = Bpe.encode(docs, "text", "doc_id", m)
      .select(col("doc_id"), concat_ws("", col("tokens")).as("spelled"))
    val want = docs.select(col("doc_id").cast("long").as("doc_id"),
      concat_ws("", transform(
        split(graft.functions.TextFns.normalize(col("text")), " "),
        w => concat(w, lit(Bpe.Model.Eow)))).as("spelled"))
    assert(enc.exceptAll(want).isEmpty && want.exceptAll(enc).isEmpty,
      "every document must spell back exactly from its BPE tokens")
  }

  test("merges actually compress: BPE token count strictly below char count") {
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") < 30)
    val m = Bpe.train(Bpe.wordTypes(docs, "text"), numMerges = 30)
    val enc = Bpe.encode(docs, "text", "doc_id", m)
    val row = enc.select(
      sum(size(col("tokens"))).cast("long").as("bpe"),
      sum(aggregate(transform(col("tokens"), t => length(t)),
        lit(0L), (acc, x) => acc + x)).cast("long").as("chars")).head
    assert(row.getLong(0) < row.getLong(1),
      s"30 merges must beat char-level tokenization: ${row}")
  }
}
