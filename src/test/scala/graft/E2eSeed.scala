package graft
import graft.ingest._
object E2eSeed {
  def main(args: Array[String]): Unit = {
    val client = new FileEsBulkClient(args(0))
    (0 until 200).grouped(10).foreach { g =>
      client.bulk(g.map { i =>
        val ts = f"2024-01-01 00:${i/60}%02d:${i%60}%02d.000000"
        BulkAction("docs", i.toString, s"""{"id":$i,"ts":"$ts","v":${i*3}}""")
      }.toSeq)
    }
    println("seeded " + args(0))
  }
}
