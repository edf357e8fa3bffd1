package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** E2 chunk/merge invariance (SURVEY §5.4): the per-document entity SET
  * must be independent of chunk size/overlap, as long as the overlap
  * exceeds the longest gazetteer surface form — mirroring the reference's
  * chunk-wise extraction + lowercase-name merge (api.py:65-83). */
class ChunkInvarianceSpec extends AnyFunSuite {

  private val corpus = SyntheticCorpus.generate(nPages = 120, seed = 42L)
  private val gaz = KgExtract.buildGazetteer(corpus.aliases)
  private val partOf = corpus.wdEntities.map(w => w.qid -> w.part_of.toSet).toMap
  private val maxAliasLen = corpus.aliases.map(_.alias.length).max

  // ambiguous surfaces are EXCLUDED from the invariant: their L14
  // resolution depends on document context by design (coherence re-rank),
  // and chunking changes the context window — the reference's chunk-wise
  // LLM extraction has the same property
  private val ambiguous: Set[String] = corpus.aliases.groupBy(_.alias)
    .collect { case (a, cs) if cs.size > 1 => a }.toSet

  private def entitySet(text: String): Set[String] =
    KgExtract.rawMentions(text, gaz, partOf)
      .filterNot(m => ambiguous.contains(m.surface))
      .map(_.canonical.toLowerCase(java.util.Locale.ROOT)).toSet

  test("entity set invariant under chunking for several size/overlap combos") {
    assert(maxAliasLen < 60, s"gazetteer grew past the overlap bound: $maxAliasLen")
    val combos = Seq((200, 60), (150, 80), (500, 64))
    corpus.pages.foreach { p =>
      val full = entitySet(p.text)
      combos.foreach { case (size, overlap) =>
        val merged = TextUtils.chunkText(p.text, size, overlap)
          .flatMap(ch => entitySet(ch)).toSet
        assert(merged == full,
          s"${p.url} size=$size overlap=$overlap: ${merged.diff(full)} / ${full.diff(merged)}")
      }
    }
  }
}
