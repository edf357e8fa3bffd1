package graft.kg

/** Single-threaded micro-profile of the fused extract pass components
  * (guide §1.1 first-principles: where does each page's CPU go?).
  * No SparkSession — pure driver-side loop over the same per-page work the
  * executors run, so the per-component shares are attributable without
  * scheduler/cache noise. Usage: runMain graft.kg.ExtractProfile [nPages]
  */
object ExtractProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val factory = new SyntheticCorpus.PageFactory(42L, 120)
    val corpus = SyntheticCorpus.generate(0)
    // same bounded tables the pipeline uses, built driver-side (no spark):
    // idf from the in-memory corpus build (bit-identical formula)
    val descByQid = corpus.wdEntities.iterator
      .map(w => w.qid -> w.descriptions.getOrElse("de", "")).toMap
    val gaz = KgExtract.buildGazetteer(corpus.aliases, descByQid)
    val partOf = corpus.wdEntities.iterator
      .filter(_.part_of.nonEmpty).map(w => w.qid -> w.part_of.toSet).toMap
    val qidInfo = corpus.aliases.groupBy(_.qid).map { case (q, as) =>
      val a = as.minBy(_.canonical); q -> (a.canonical, a.entity_type)
    }
    val patterns = corpus.patterns
      .groupBy(_.lang).map { case (l, ps) => l -> ps.map(p => p.middle -> p).toMap }
    val cfg = KgConfig.default

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      a
    }

    (0 until 2).foreach { round =>
      println(s"[profile] --- round $round (round 0 = JIT warmup) ---")
      val pages = time("1 page generation")((0 until n).map(factory.page).toArray)
      val texts = time("2 extractText(html)")(pages.map(p => TextExtract.extractText(p.html)))
      val mentions = time("3 rawMentions (AC find + score)")(
        texts.map(t => KgExtract.rawMentions(t, gaz, partOf, cfg.tfidfWeight)))
      val outs = time("4 DocProcess.process")(
        pages.indices.map { i =>
          DocProcess.process(pages(i).url, texts(i), pages(i).lang, mentions(i),
            patterns, partOf, cfg, qidInfo)
        }.toArray)
      // sub-phases of 3: automaton find alone vs scoring
      time("3a automaton find only")(texts.map(t => gaz.automaton.find(t)))
      time("3b tokenize only")(texts.map(t => KgExtract.tokenize(t)))
      val total = outs.map(_._2.length.toLong).sum
      println(s"[profile] triples=$total over $n pages")
      // phase-4 suspects in isolation, at realistic call volumes
      val idCalls = pages.indices.flatMap(i =>
        mentions(i).map(m => (pages(i).url, m.canonical)))
      time(s"4a entityId x${idCalls.size}")(
        idCalls.map { case (u, c) => TextUtils.entityId(u, c) })
      val preds = outs.flatMap(_._2.map(_.predicate))
      val predPairs = preds.take(20000).sliding(2).toArray
      time(s"4b seqRatio x${predPairs.length}")(
        predPairs.map(p => if (p.length == 2) TextUtils.seqRatio(p(0), p(1)) else 0.0))
      time("4c sentences")(texts.map(DocProcess.sentences))
      val names = idCalls.map(_._2)
      time(s"4d normName x${names.size}")(names.map(TextUtils.normName))
    }
  }
}
