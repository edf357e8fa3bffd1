package graft.kg

import graft.SparkSpec
import javax.xml.parsers.DocumentBuilderFactory

/** S10 minimal graph export: well-formed GraphML (JDK parser), correct
  * node/edge counts, XML escaping, deterministic ordering. */
class GraphExportSpec extends SparkSpec {
  import spark.implicits._

  private def parse(path: String) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new java.io.File(path))
  }

  test("pipeline result exports well-formed GraphML with closed edge set") {
    val corpus = SyntheticCorpus.generate(nPages = 30, seed = 11L)
    val res = Pipeline.run(spark, spark.createDataset(corpus.pages),
      Pipeline.dictsFromCorpus(spark, corpus))
    val path = java.nio.file.Files.createTempFile("graft", ".graphml").toString
    GraphExport.writeResult(res, path)
    val doc = parse(path)
    val nNodes = doc.getElementsByTagNameNS("*", "node").getLength
    val nEdges = doc.getElementsByTagNameNS("*", "edge").getLength
    val distinctNodes = res.nodes.select("entity").distinct().count()
    val distinctEdges = res.edges.select("subject", "predicate", "object")
      .distinct().count()
    assert(nNodes == distinctNodes, s"$nNodes vs $distinctNodes")
    assert(nEdges == distinctEdges, s"$nEdges vs $distinctEdges")
    // every edge endpoint resolves to an exported node id
    val ids = (0 until nNodes).map(i =>
      doc.getElementsByTagNameNS("*", "node").item(i).getAttributes
        .getNamedItem("id").getNodeValue).toSet
    (0 until nEdges).foreach { i =>
      val attrs = doc.getElementsByTagNameNS("*", "edge").item(i).getAttributes
      assert(ids.contains(attrs.getNamedItem("source").getNodeValue))
      assert(ids.contains(attrs.getNamedItem("target").getNodeValue))
    }
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("nodes carry the canonicalization component as a node attribute") {
    val nodes = Seq(("a", "T"), ("b", "T"), ("c", "T"), ("d", "T"), ("e", "T"))
      .toDF("entity", "t")
      .select(org.apache.spark.sql.functions.col("entity"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("t").as("typ")).as("details"))
    val edges = Seq(("a", "rel", "b"), ("c", "rel", "d"))
      .toDF("subject", "predicate", "object")
    // two components: {a,b} canonicalized to a, {c,d} to c; e is absent
    // from the components table (isolated → falls back to its own id)
    val components = Seq(("a", "a"), ("b", "a"), ("c", "c"), ("d", "c"))
      .toDF("node", "component")
    val res = Pipeline.Result(nodes, edges, components, spark.emptyDataFrame)
    val path = java.nio.file.Files.createTempFile("graft", ".graphml").toString
    GraphExport.writeResult(res, path)
    val doc = parse(path)
    // the component key is declared
    val keys = doc.getElementsByTagNameNS("*", "key")
    val keyNames = (0 until keys.getLength).map(i =>
      keys.item(i).getAttributes.getNamedItem("attr.name").getNodeValue).toSet
    assert(keyNames.contains("component"))
    // per-node component values: a,b → "a"; c,d → "c"
    val nodeEls = doc.getElementsByTagNameNS("*", "node")
    val compOf = (0 until nodeEls.getLength).map { i =>
      val el = nodeEls.item(i).asInstanceOf[org.w3c.dom.Element]
      val datas = el.getElementsByTagNameNS("*", "data")
      val comp = (0 until datas.getLength).collectFirst {
        case j if datas.item(j).getAttributes.getNamedItem("key")
          .getNodeValue == "d2" => datas.item(j).getTextContent
      }.get
      el.getAttribute("id") -> comp
    }.toMap
    assert(compOf ==
      Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "c", "e" -> "e"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("XML-special characters in names and predicates are escaped") {
    val nodes = Seq(("a & b <x>", "Typ\"1"), ("c'd", "T")).toDF("id", "typ")
    val edges = Seq(("a & b <x>", "c'd", "hat <teil> & mehr"))
      .toDF("source", "target", "label")
    val path = java.nio.file.Files.createTempFile("graft", ".graphml").toString
    GraphExport.writeGraphml(nodes, edges, path)
    val doc = parse(path) // throws on malformed XML
    val edge = doc.getElementsByTagNameNS("*", "edge").item(0)
    assert(edge.getAttributes.getNamedItem("source").getNodeValue == "a & b <x>")
    assert(edge.getTextContent == "hat <teil> & mehr")
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("export is deterministic across partitionings") {
    val corpus = SyntheticCorpus.generate(nPages = 10, seed = 5L)
    def export(parts: Int): String = {
      val res = Pipeline.run(spark,
        spark.createDataset(corpus.pages).repartition(parts),
        Pipeline.dictsFromCorpus(spark, corpus))
      val path = java.nio.file.Files.createTempFile("graft", ".graphml").toString
      GraphExport.writeResult(res, path)
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
      s
    }
    assert(export(2) == export(5))
  }
}
