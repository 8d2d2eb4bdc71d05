package graft
object KeyCheck {
  def main(args: Array[String]): Unit = {
    println("QUERYKEYS: " + SparkEntry.queries.keys.toSeq.sorted.mkString(","))
    println("ORACLEKEYS: " + SparkEntry.oracleSql.keys.toSeq.sorted.mkString(","))
  }
}
