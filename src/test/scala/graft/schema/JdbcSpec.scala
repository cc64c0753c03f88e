package graft.schema

/** Option-plumbing contracts for the JDBC wiring (no database ships
  * in this environment, so load/save are exercised only at the
  * option-map layer — exactly the part we own).
  */
class JdbcSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("partitioned read options carry the full range-scan spec") {
    val opts = Jdbc.readOptions("jdbc:postgresql://h/db", "orders",
      partitionColumn = Some("o_orderkey"), bounds = Some((1L, 1000000L)),
      numPartitions = 16, fetchSize = 5000)
    assert(opts("partitionColumn") == "o_orderkey")
    assert(opts("lowerBound") == "1" && opts("upperBound") == "1000000")
    assert(opts("numPartitions") == "16")
    assert(opts("fetchsize") == "5000")
    assert(opts("dbtable") == "orders")
  }

  test("half-specified partitioning fails loudly, not silently serial") {
    intercept[IllegalArgumentException] {
      Jdbc.readOptions("jdbc:x", "t", partitionColumn = Some("id"))
    }
    intercept[IllegalArgumentException] {
      Jdbc.readOptions("jdbc:x", "t", bounds = Some((1L, 2L)))
    }
  }

  test("unpartitioned read and write options are minimal") {
    val r = Jdbc.readOptions("jdbc:x", "t")
    assert(!r.contains("partitionColumn") && !r.contains("numPartitions"))
    val w = Jdbc.writeOptions("jdbc:x?sslmode=require", "warehouse_t", batchSize = 2000)
    assert(w("batchsize") == "2000")
    assert(w("url").contains("sslmode=require"))
  }
}
