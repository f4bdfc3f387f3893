package graft

import org.apache.spark.sql.functions._
import graft.pipelines.CustomerDecorate

/** Golden end-to-end test of the decorated-document pipeline at
  * sf0.001 (SURVEY §5.3: fixture inputs through the full pipeline,
  * canonical-JSON diff against checked-in goldens).
  */
class CustomerDecorateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("golden: customer 1 document byte-exact") {
    val doc = CustomerDecorate.json(spark, dir)
      .where(col("id") === 1L).select("doc").as[String].head()
    val golden =
      """{"name":"Customer#000000001","geo":{"nation":"NATION_19","region":"MIDDLE EAST"},""" +
      """"acctbal_bin":2,"n_orders":5,"lifetime_value":615196.44,""" +
      """"first_order":{"id":176,"date":"1996-07-19T00:00:00.000Z","priority":"4-NOT SPECIFIED"},""" +
      """"orders":[{"date":"1996-07-19T00:00:00.000Z","id":176,"total":201666.9,"priority":"4-NOT SPECIFIED"},""" +
      """{"date":"1996-12-10T00:00:00.000Z","id":571,"total":13090.45,"priority":"2-HIGH"},""" +
      """{"date":"1997-01-09T00:00:00.000Z","id":812,"total":65309.82,"priority":"5-LOW"},""" +
      """{"date":"1998-06-11T00:00:00.000Z","id":132,"total":202733.95,"priority":"1-URGENT"},""" +
      """{"date":"1999-06-30T00:00:00.000Z","id":51,"total":132395.32,"priority":"2-HIGH"}],""" +
      """"n_sessions":51,"n_events":51}"""
    assert(doc == golden)
  }

  test("golden: customer without events has session fields pruned (P3)") {
    val doc = CustomerDecorate.json(spark, dir)
      .where(col("id") === 42L).select("doc").as[String].head()
    assert(!doc.contains("n_sessions"), "absent stats must be pruned, not null")
    assert(doc.contains(""""n_orders":15"""))
    assert(doc.contains(""""lifetime_value":4522842.06"""))
  }

  test("every customer appears exactly once with consistent counts") {
    val d = CustomerDecorate.run(spark, dir)
    val total = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(d.count() == total)
    assert(d.select("id").distinct().count() == total)
    // n_orders always equals the orders array size when present
    val bad = d.where(col("n_orders").isNotNull &&
      size(col("orders")) =!= col("n_orders")).count()
    assert(bad == 0)
  }
}
