package graft.kg

import graft.SparkSpec

/** Bounded driver-side link tables (VERDICT r3 item 2): the distributed
  * boundedLinkTables build must be semantically invisible — identical idf
  * (df counted distributed vs driver-side), descriptions restricted to
  * exactly the ambiguous surfaces' candidates, part_of to alias-table
  * qids — and the gazetteer built from the bounded inputs must equal the
  * one built from the full maps. */
class GazetteerBoundSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = SyntheticCorpus.generate(20)
  private lazy val fullDesc: Map[String, String] =
    corpus.wdEntities.map(w => w.qid -> w.descriptions.getOrElse("de", "")).toMap
  private lazy val fullPartOf: Map[String, Set[String]] =
    corpus.wdEntities.map(w => w.qid -> w.part_of.toSet).toMap
  private lazy val lt =
    KgExtract.boundedLinkTables(spark, corpus.wdEntities.toDF(), corpus.aliases)

  test("distributed idf is bit-identical to the driver-side full build") {
    val full = KgExtract.buildGazetteer(corpus.aliases, fullDesc)
    assert(lt.idf == full.idf)
  }

  test("descByQid is bounded to ambiguous surfaces' candidates, values intact") {
    val ambiguous = corpus.aliases.groupBy(_.alias).values
      .filter(_.size > 1).flatten.map(_.qid).toSet
    assert(lt.descByQid.keySet == ambiguous.intersect(fullDesc.keySet))
    lt.descByQid.foreach { case (q, d) => assert(d == fullDesc(q)) }
    // the bound is real: this corpus has far more entities than ambiguous
    // candidates
    assert(lt.descByQid.size < fullDesc.size)
  }

  test("partOf is bounded to alias-table qids with non-empty sets, values intact") {
    val aliasQids = corpus.aliases.map(_.qid).toSet
    assert(lt.partOf.keySet ==
      aliasQids.filter(q => fullPartOf.getOrElse(q, Set.empty).nonEmpty))
    lt.partOf.foreach { case (q, ps) => assert(ps == fullPartOf(q)) }
  }

  test("gazetteer from bounded inputs equals the full-map build") {
    val full = KgExtract.buildGazetteer(corpus.aliases, fullDesc)
    val bounded = KgExtract.buildGazetteer(corpus.aliases, lt.descByQid, Some(lt.idf))
    assert(bounded.idf == full.idf)
    assert(bounded.candidates.toSeq == full.candidates.toSeq)
    assert(bounded.candVecs.toSeq == full.candVecs.toSeq)
    // scoring parity over documents exercising ambiguous mentions
    corpus.pages.foreach { p =>
      val a = KgExtract.rawMentions(p.text, full, fullPartOf)
      val b = KgExtract.rawMentions(p.text, bounded, lt.partOf)
      assert(a == b, p.url)
    }
  }
}
