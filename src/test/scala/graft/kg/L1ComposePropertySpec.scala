package graft.kg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized equivalence of the PRE-COMPOSED L1 dictionary join against
  * the sequential two-join formulation it replaced (round 5):
  *   sequential: entities ⟕ redirects (w_lookup = coalesce(to, entity))
  *               ⟕ primary ON w_lookup = title
  *   composed:   entities ⟕ l1Dict ON entity = l1_key
  *               (w_lookup = coalesce(l1_lookup, entity))
  * over seeded random dictionaries that include every interaction class:
  * titles that are also redirect sources, redirects to missing pages,
  * entities matching nothing, and unique-key dictionaries (the realistic
  * shape both formulations assume). */
class L1ComposePropertySpec extends SparkSpec {
  import spark.implicits._

  private def run(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val names = (0 until 80).map(i => s"N${rnd.nextInt(60)}_$i") // unique
    val titles = rnd.shuffle(names).take(40)
    val titleSet = titles.toSet
    // redirect sources: half from names that are ALSO titles (shadowing),
    // half fresh; targets: mix of real titles and missing pages
    val redirSrcs = rnd.shuffle(names).take(20).distinct
    val redirects = redirSrcs.map { s =>
      val target =
        if (rnd.nextBoolean()) titles(rnd.nextInt(titles.size))
        else s"Missing${rnd.nextInt(10)}"
      RedirectRow(s, target, "de")
    }
    val wiki = titles.map(t => WikiPageRow(t, "de", s"url://$t",
      s"extract of $t sufficiently long " * 6, Nil, Nil, null, Map.empty, null))
    val entities = (0 until 120).map { i =>
      val e =
        if (rnd.nextBoolean()) names(rnd.nextInt(names.size))
        else s"Unknown${rnd.nextInt(25)}"
      (s"doc://$i", e)
    }.toDF("url", "entity")

    val primary = wiki.toDF().filter(col("lang") === "de")
      .select(col("title").as("w_title"), col("url").as("w_url"),
        col("extract").as("w_extract"))
    val redir = redirects.toDF().select("from_title", "to_title")

    // sequential reference formulation (the pre-round-5 plan shape)
    val seq1 = entities
      .join(redir, col("entity") === col("from_title"), "left")
      .withColumn("w_lookup", coalesce(col("to_title"), col("entity")))
      .drop("from_title", "to_title")
      .join(primary, col("w_lookup") === col("w_title"), "left")
      .select("url", "entity", "w_lookup", "w_url", "w_extract")

    // composed formulation (exactly Linking.prepare's l1Dict build)
    val pCols = primary.columns.map(primary(_)).toIndexedSeq
    val l1Dict = redir
      .join(primary, col("to_title") === col("w_title"), "left")
      .select(col("from_title").as("l1_key") +:
        col("to_title").as("l1_lookup") +: pCols: _*)
      .unionByName(primary
        .join(redir, primary("w_title") === redir("from_title"), "left_anti")
        .select(primary("w_title").as("l1_key") +:
          primary("w_title").as("l1_lookup") +: pCols: _*))
    val comp1 = entities
      .join(l1Dict, col("entity") === col("l1_key"), "left")
      .withColumn("w_lookup", coalesce(col("l1_lookup"), col("entity")))
      .select("url", "entity", "w_lookup", "w_url", "w_extract")

    val a = seq1.as[(String, String, String, String, String)].collect().sorted
    val b = comp1.as[(String, String, String, String, String)].collect().sorted
    assert(a.sameElements(b),
      s"seed=$seed: composed != sequential (${a.length} vs ${b.length} rows)")
  }

  test("composed l1Dict join == sequential redirect+primary joins (5 seeds)") {
    Seq(1L, 7L, 42L, 1234L, 99999L).foreach(run)
  }
}
