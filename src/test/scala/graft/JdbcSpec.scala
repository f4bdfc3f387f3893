package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** S1–S3 exercised END-TO-END against embedded Apache Derby (ships in
  * Spark's jars directory — pure-JVM, in-memory, no server), so
  * `spark.read.jdbc`'s query pushdown, range partitioning, and
  * `predicates` batching all execute for real, not compile-only. The
  * pure batching logic keeps its database-free tests below.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  /** Seed a genes table once for the suite: 1000 rows, ids 0..999. */
  private lazy val seeded: Unit = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("graft-derby").toString)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        "CREATE TABLE genes (gene_id BIGINT PRIMARY KEY, name VARCHAR(32), taxon_id BIGINT)")
      val ps = conn.prepareStatement("INSERT INTO genes VALUES (?, ?, ?)")
      (0L until 1000L).foreach { i =>
        ps.setLong(1, i); ps.setString(2, s"G$i"); ps.setLong(3, i % 7)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("S1 readQuery: whole SQL pushed down to the database") {
    seeded
    val df = Jdbc.readQuery(spark, url,
      "SELECT gene_id, name FROM genes WHERE taxon_id = 3")
    val rows = df.collect()
    assert(rows.length === 143)   // ids with id % 7 == 3 among 0..999
    assert(rows.forall(r => r.getLong(0) % 7 == 3))
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("gene_id", "name"))
  }

  test("S2 readPartitioned: range partitioning yields the requested parallel slices") {
    seeded
    val df = Jdbc.readPartitioned(spark, url, "genes",
      partitionCol = "gene_id", lower = 0L, upper = 1000L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    // no row lost or duplicated at the slice boundaries
    assert(df.count() === 1000L)
    assert(df.selectExpr("sum(gene_id)").head().getLong(0) === (0L until 1000L).sum)
    // every partition got real work (the ranges cover the id space)
    val perPart = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.forall(_ > 0), perPart.toSeq.toString)
  }

  test("S3 readByIdBatches: one JDBC partition per IN-list batch") {
    seeded
    val ids = (0L until 1000L by 2L) // 500 even ids
    val df = Jdbc.readByIdBatches(spark, url, "genes", "gene_id", ids, batchSize = 100)
    assert(df.rdd.getNumPartitions === 5) // 500 ids / 100 per batch
    val got = df.select("gene_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === ids.toSeq)
  }

  test("id batches: dedup, sort, cut at batchSize") {
    val preds = Jdbc.idBatchPredicates("root_id", Seq(5L, 3L, 5L, 1L, 2L, 4L), 2)
    assert(preds == Seq(
      "root_id IN (1,2)",
      "root_id IN (3,4)",
      "root_id IN (5)"))
  }

  test("id batches: empty ids produce no predicates") {
    assert(Jdbc.idBatchPredicates("id", Nil, 100).isEmpty)
  }

  test("id batches: every id appears in exactly one predicate") {
    val ids = (1L to 1001L).map(i => (i * 7919) % 1000)
    val preds = Jdbc.idBatchPredicates("id", ids, 100)
    val recovered = preds.flatMap(p =>
      p.stripPrefix("id IN (").stripSuffix(")").split(",").map(_.toLong))
    assert(recovered.toSet == ids.toSet)
    assert(recovered.length == ids.distinct.length)
    assert(preds.forall(p => p.count(_ == ',') < 100))
  }
}
