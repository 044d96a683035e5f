object ListUngated {
  def main(args: Array[String]): Unit = {
    val d = graft.SparkEntry.declared
    val ungated = d.filter(_.oracle.isEmpty).map(_.name).sorted
    println(s"declared=${d.size} gated=${d.count(_.oracle.nonEmpty)} ungated=${ungated.size}")
    ungated.foreach(println)
  }
}
