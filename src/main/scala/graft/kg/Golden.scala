package graft.kg

import java.nio.file.{Files, Paths}

/** Location + drift protocol for the Verify-generated golden parquet
  * (the independent Scala oracle's output, read back by the driver's
  * DuckDB compare).
  *
  * Path: shared between `graft.Verify` (writer) and the oracle SQL
  * (reader) via one env var, so the compare works from any checkout
  * location and never silently reads a stale absolute path.
  *
  * Drift gate: GOLDEN_HASH (committed) pins a version + content hash per
  * golden. `Verify` recomputes the hash from the oracle rows and FAILS
  * LOUDLY if it changed without a version bump — a silent co-drift of
  * generator + oracle (both are repo code) would otherwise pass the
  * parity compare unnoticed.
  */
object Golden {

  /** The goldens Verify regenerates: (name, version, cfg). The restricted
    * variant exercises P12 type restrictions + the E4 standalone
    * implied-entity stage end-to-end (both default-off in
    * KgConfig.default). Bump a version here + in GOLDEN_HASH on any
    * intentional semantic change. */
  val variants: Seq[(String, Int, KgConfig)] = Seq(
    ("kg_pipeline_triples", 1, KgConfig.default),
    ("kg_pipeline_restricted", 1, KgConfig.default.copy(
      allowedEntityTypes = Some(Set("Person", "Ort", "Organisation")),
      inferEntities = true)))

  /** Absolute golden directory: env override, else <cwd>/golden. */
  def dir: String = sys.env.getOrElse("SPARK_GRAFT_GOLDEN_DIR",
    Paths.get("golden").toAbsolutePath.toString)

  def path(name: String): String = s"$dir/$name"

  private val hashFile = Paths.get("GOLDEN_HASH")

  def sha1(canonical: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(canonical.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }

  /** Enforce the drift gate for one golden: `expected` lines in GOLDEN_HASH
    * have the form `<name> v<version> <sha1>`. A hash change under the same
    * version is a hard failure; bump the version in the SAME commit as an
    * intentional semantic change. */
  def check(name: String, version: Int, contentHash: String): Unit = {
    if (!Files.exists(hashFile)) return // no gate committed (fresh checkout)
    val lines = Files.readAllLines(hashFile)
    val entry = scala.jdk.CollectionConverters.ListHasAsScala(lines).asScala
      .map(_.trim.split("\\s+")).find(p => p.length == 3 && p(0) == name)
    entry.foreach { case Array(_, ver, hash) =>
      if (ver == s"v$version" && hash != contentHash)
        throw new IllegalStateException(
          s"GOLDEN DRIFT: $name content hash changed ($hash -> $contentHash) " +
          s"without a version bump ($ver). If the generator/oracle change is " +
          "intentional, bump the version and update GOLDEN_HASH in the same commit.")
      if (ver != s"v$version")
        throw new IllegalStateException(
          s"GOLDEN VERSION MISMATCH: $name code says v$version, GOLDEN_HASH says $ver — " +
          "update GOLDEN_HASH to match the code's version + hash.")
    }
  }
}
