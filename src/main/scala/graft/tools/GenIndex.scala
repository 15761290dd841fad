// scratch generator -- prints the query index grouped by pack
package graft.tools

object GenIndex {
  def main(args: Array[String]): Unit = {
    val packs = graft.SparkEntry.packs
    println("# Query index\n")
    println("Auto-generated from `SparkEntry.packs` -- " +
      s"${graft.SparkEntry.queries.size} oracle-checked queries.\n")
    packs.foreach { p =>
      val name = p.getClass.getSimpleName.stripSuffix("$")
      val qs = p.queries.keys.toSeq.sorted
      println(s"## $name (${qs.size})\n")
      qs.grouped(3).foreach { g => println(g.map("`" + _ + "`").mkString(", ")) }
      println()
    }
  }
}
