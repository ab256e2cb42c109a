package graft.analytics

import graft.SparkSpec

/** The d4 double-work fix, pinned: hashing shingles BEFORE the distinct
  * makes the signature branch and the intersection branch consume
  * identical subtrees, so AQE's ReuseExchange plans the distinct's
  * shuffle once instead of per branch. */
class D4ReuseSpec extends SparkSpec {
  test("d4 reuses the shingle-hash exchange across branches") {
    val df = graft.SparkEntry.queries("d4_ngram_jaccard")(spark, sf())
    df.collect() // finalize the adaptive plan (reuse is an AQE decision)
    val p = df.queryExecution.executedPlan.toString
    val reused = p.linesIterator.count(_.contains("ReusedExchange"))
    assert(reused >= 1, "shingle distinct shuffle must be planned once and reused")
  }
}
