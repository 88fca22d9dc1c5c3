package graft.tools

/** Dev-loop: print the query/oracle map sizes. */
object CountQ {
  def main(a: Array[String]): Unit =
    println("NQ=" + graft.SparkEntry.queries.size +
      " NO=" + graft.SparkEntry.oracleSql.size)
}
