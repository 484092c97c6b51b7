package graft

/** The SQL facade: tables attached as views + custom functions callable
  * from plain spark.sql. */
class EngineSpec extends SparkSpec {

  test("attach + sql: full relational surface through spark.sql") {
    Engine.attach(spark, sf0001)
    val n = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin).count()
    assert(n > 0)
  }

  test("custom native functions usable from SQL") {
    Engine.registerFunctions(spark)
    Engine.attach(spark, sf0001)
    val row = spark.sql(
      """SELECT doc_id,
        |  size(shingle_hashes(text)) AS n_shingles,
        |  size(minhash_sig(shingle_hashes(text))) AS sig_len,
        |  simhash64(text) AS fp
        |FROM documents LIMIT 1""".stripMargin).collect().head
    assert(row.getInt(1) > 0)
    assert(row.getInt(2) === 128)
    val sim = spark.sql(
      """SELECT dot_product(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>)) /
        |       (l2_norm(CAST(embedding AS ARRAY<DOUBLE>)) * l2_norm(CAST(embedding AS ARRAY<DOUBLE>))) AS c
        |FROM embeddings LIMIT 3""".stripMargin).collect()
    sim.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}
