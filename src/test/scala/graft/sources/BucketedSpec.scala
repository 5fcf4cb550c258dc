package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed layout: a join of two tables bucketed on the join key must
  * plan with NO shuffle exchange; the same join over plain parquet must
  * have one (the negative control proving the assert means something). */
class BucketedSpec extends AnyFunSuite with SparkTestBase {

  test("co-located join over bucketed tables has no shuffle; plain join does") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    // negative control: plain parquet join (disable auto-broadcast so the
    // small side does not turn it into a broadcast join)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      assert(Bucketed.hasShuffle(plain), "plain join should shuffle")

      Bucketed.write(orders, "orders_b", Seq("o_custkey"), buckets = 4)
      Bucketed.write(customer, "customer_b", Seq("c_custkey"), buckets = 4)
      val ob = Bucketed.read(spark, "orders_b")
      val cb = Bucketed.read(spark, "customer_b")
      val joined = ob.join(cb, ob("o_custkey") === cb("c_custkey"))
      assert(!Bucketed.hasShuffle(joined),
        s"bucketed join must be co-located:\n${joined.queryExecution.executedPlan}")
      // and it is still correct
      assert(joined.count() ==
        orders.join(customer, orders("o_custkey") === customer("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
