package graft
object GlobRepro {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("globrepro")
    val p = new org.apache.hadoop.fs.Path("/root/reference/data/raw/*.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(p)
    println(s"GLOB RESULT: ${if (st == null) "null" else st.length.toString}")
    val dirSt = fs.listStatus(new org.apache.hadoop.fs.Path("/root/reference/data/raw"))
    println(s"LIST RESULT: ${dirSt.length}")
    val n = spark.read.option("wholetext", "true").text("/root/reference/data/raw/*.json").count()
    println(s"READ COUNT: $n")
    spark.stop()
  }
}
