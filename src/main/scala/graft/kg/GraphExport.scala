package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10 (minimal): GraphML export of the node/edge tables — the batch
  * stand-in for the reference's graph artifact output
  * (core/visualization/renderer.py:18-302 renders PNG/HTML per run; the
  * PNG/HTML renderers are scoped out by SURVEY §2.1, this writer closes
  * the "a user gets a graph artifact out" surface).
  *
  * GraphML is a single XML document, so this is a driver-side STREAMED
  * write (toLocalIterator — no full collect): intended for bounded,
  * presentation-scale graphs, exactly like the reference's renderer
  * (single-document or filtered subgraphs). At corpus scale, filter the
  * edge table first (per url / per component); the node and edge line
  * generation itself is distributed and ordered for determinism.
  */
object GraphExport {

  private[kg] def esc(s: String): String =
    if (s == null) ""
    else s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&apos;"
      case c => c.toString
    }

  /** Write GraphML to a local path. `nodes` must carry (id, typ) and may
    * carry a `component` column (exported as a node attribute — the
    * reference colors its rendered graph by component,
    * graph_builder.py:112); `edges` (source, target, label). Dangling edge
    * endpoints are legal GraphML but rejected here — the pipeline
    * guarantees closed edge sets (R3). */
  def writeGraphml(nodes: DataFrame, edges: DataFrame, path: String): Unit = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val hasComponent = nodes.columns.contains("component")
    val nodeLines =
      if (hasComponent)
        nodes.select(col("id").cast("string"), col("typ").cast("string"),
            col("component").cast("string"))
          .distinct().orderBy("id")
          .map { r =>
            s"""    <node id="${esc(r.getString(0))}"><data key="d0">${esc(r.getString(1))}</data>""" +
              s"""<data key="d2">${esc(r.getString(2))}</data></node>"""
          }
      else nodes.select(col("id").cast("string"), col("typ").cast("string"))
        .distinct().orderBy("id")
        .map { r =>
          s"""    <node id="${esc(r.getString(0))}"><data key="d0">${esc(r.getString(1))}</data></node>"""
        }
    val edgeLines = edges
      .select(col("source").cast("string"), col("target").cast("string"),
        col("label").cast("string"))
      .distinct().orderBy("source", "label", "target")
      .map { r =>
        s"""    <edge source="${esc(r.getString(0))}" target="${esc(r.getString(1))}">""" +
          s"""<data key="d1">${esc(r.getString(2))}</data></edge>"""
      }
    val pw = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)),
        java.nio.charset.StandardCharsets.UTF_8))
    try {
      pw.println("""<?xml version="1.0" encoding="UTF-8"?>""")
      pw.println("""<graphml xmlns="http://graphml.graphdrawing.org/xmlns">""")
      pw.println("""  <key id="d0" for="node" attr.name="type" attr.type="string"/>""")
      pw.println("""  <key id="d1" for="edge" attr.name="predicate" attr.type="string"/>""")
      if (hasComponent)
        pw.println("""  <key id="d2" for="node" attr.name="component" attr.type="string"/>""")
      pw.println("""  <graph id="G" edgedefault="directed">""")
      nodeLines.toLocalIterator().forEachRemaining(pw.println)
      edgeLines.toLocalIterator().forEachRemaining(pw.println)
      pw.println("  </graph>")
      pw.println("</graphml>")
    } finally pw.close()
  }

  /** Convenience projection from the pipeline's node/edge tables:
    * node id = entity name (the reference graph's node identity), edge
    * label = predicate, component = the canonicalization component the
    * entity landed in (its own name when no alias/redirect connects it —
    * the CC convention for isolated nodes). The components table spans
    * ALL alias/redirect dictionary nodes (DICTIONARY-scale, ~10^8 rows at
    * target scale), so it is semi-joined down to the exported node ids
    * BEFORE the broadcast — the broadcast side is then bounded by the
    * presentation-scale export, not the dictionary. */
  def writeResult(res: Pipeline.Result, path: String): Unit = {
    val exported = res.nodes
      .select(col("entity").as("id"), col("details.typ").as("typ"))
    val comp = res.components
      .select(col("node").as("c_node"), col("component").as("c_comp"))
      .join(exported.select(col("id")).distinct(),
        col("c_node") === col("id"), "left_semi")
    val nodes = exported
      .join(broadcast(comp), col("id") === col("c_node"), "left")
      .select(col("id"), col("typ"),
        coalesce(col("c_comp"), col("id")).as("component"))
    writeGraphml(
      nodes,
      res.edges.select(col("subject").as("source"), col("object").as("target"),
        col("predicate").as("label")),
      path)
  }
}
