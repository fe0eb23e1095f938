package graft.corpus

import graft.SparkSpec

/** CorpusOps.bigramSurprisal: hand-computed bits on a tiny corpus, and
  * the property that motivates the operator — a word-order scramble
  * with an identical token multiset (invisible to q113's unigram
  * surprisal) scores strictly higher conditional bits.
  */
class BigramSurprisalSpec extends SparkSpec {

  test("hand-computed fixture") {
    val spark0 = spark
    import spark0.implicits._
    // corpus: d1 = "a b a b", d2 = "a b b a"
    // unigrams: N=8, c(a)=c(b)=4 -> ubits = bitlen(8/4)-1 = 1
    // bigrams: cvw(ab)=3, cvw(ba)=2, cvw(bb)=1; cv(a.)=3, cv(b.)=3
    // bits: ab -> bitlen(3/3)-1 = 0; ba -> bitlen(3/2=1)-1 = 0;
    //       bb -> bitlen(3/1=3)-1 = 1
    // d1: 1 + 2*0 + 1*0 = 1 bit over 4 tokens
    // d2: 1 + 0 + 1 + 0 = 2 bits over 4 tokens
    val docs = Seq((1L, "a b a b"), (2L, "a b b a")).toDF("doc_id", "text")
    val out = CorpusOps.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.25, 0.5))
  }

  test("word-order scramble scores higher than fluent order at equal unigram info") {
    val spark0 = spark
    import spark0.implicits._
    // 9 fluent repetitions fix the bigram distribution; the scramble
    // reuses the same tokens in an order the corpus rarely produces
    val fluent = (1L to 9L).map(i => (i, "the cat sat on the mat"))
    val docs = (fluent :+ ((10L, "mat the on sat cat the"))).toDF("doc_id", "text")
    val uni = CorpusOps.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(2))
    assert(uni(0) == uni(9), "unigram surprisal cannot distinguish the scramble")
    val bi = CorpusOps.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => r.getLong(2))
    assert(bi(9) > bi(0), "bigram surprisal must charge the broken word order")
  }

  test("single-token and null documents") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "solo"), (2L, null.asInstanceOf[String]),
      (3L, "solo solo")).toDF("doc_id", "text")
    val out = CorpusOps.bigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // null text drops (q113 contract); d1 has no bigrams -> unigram charge only
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // N=3, c(solo)=3 -> ubits = bitlen(1)-1 = 0; d3 bigram "solo solo":
    // cvw=1, cv=1 -> bits 0
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 0L))
  }
}
