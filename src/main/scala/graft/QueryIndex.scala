package graft

/** Dev tool: regenerate docs/QUERY_INDEX.md from the live pack list
  * (`tools/run.sh graft.QueryIndex docs/QUERY_INDEX.md`) so the index
  * can never drift from `SparkEntry.packs`.
  */
object QueryIndex {
  def main(args: Array[String]): Unit = {
    val sections = SparkEntry.packs.map { p =>
      val cls = p.getClass.getSimpleName.stripSuffix("$")
      val names = p.queries.keys.toSeq.sorted
      val body = names.grouped(3).map(_.map(n => s"`$n`").mkString(", "))
        .mkString("\n")
      s"## $cls (${names.size})\n\n$body\n"
    }
    val total = SparkEntry.packs.map(_.queries.size).sum
    val doc = s"# Query index\n\nAuto-generated from `SparkEntry.packs`" +
      s" -- $total oracle-checked queries.\n" +
      s" Regenerate: `tools/run.sh graft.QueryIndex docs/QUERY_INDEX.md`\n\n" +
      sections.mkString("\n")
    args.headOption match {
      case Some(f) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f), doc)
        println(s"wrote $f ($total queries)")
      case None => println(doc)
    }
  }
}
