package graft.operators

import graft.SparkSpec

/** Salted join must be result-equivalent to the plain join (the salt only
  * changes the physical distribution). */
class SaltedJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val plain = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val salted = Relational.saltedJoin(orders, customer,
        "o_custkey", "c_custkey", salt = 7)
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(plain.nonEmpty)
    assert(salted.toSeq == plain.toSeq)
  }
}
