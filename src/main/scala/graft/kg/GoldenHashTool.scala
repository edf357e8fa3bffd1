package graft.kg

/** Prints the current `<name> v<version> <sha1>` lines for GOLDEN_HASH.
  * Run after an INTENTIONAL generator/oracle/cfg change (with the version
  * bumped in Verify.writeGoldens) and paste the output into GOLDEN_HASH. */
object GoldenHashTool {
  def main(args: Array[String]): Unit = {
    val corpus = SyntheticCorpus.generate(nPages = 100, seed = 42L)
    Golden.variants.foreach { case (name, version, cfg) =>
      val golden = corpus.pages.flatMap { p =>
        Oracle.processDoc(p, corpus.aliases, corpus.patterns,
          corpus.wdEntities, cfg)._2
          .map(t => (p.url, t.subject, t.predicate, t.obj, t.inferred))
      }
      // \u0001 field separator: unambiguous even if a field ever contains
      // another field's prefix (must match Verify.writeGoldens exactly)
      val canonical = golden.sorted.map(_.productIterator.mkString("\u0001"))
        .mkString("\n")
      println(s"$name v$version ${Golden.sha1(canonical)}")
    }
  }
}
