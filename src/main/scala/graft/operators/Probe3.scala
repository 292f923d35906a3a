package graft.operators
// scratch - not committed
object Probe3 {
  def main(args: Array[String]): Unit = {
    val out = new java.io.PrintWriter("/tmp/xxh3_vectors.csv")
    out.println("key,hash")
    // ids covering len 1..20 digit strings
    val ids = (0L to 99999L) ++ Seq(123456L, 1234567L, 12345678L,
      123456789L, 1234567890L, 12345678901L, 123456789012L,
      1234567890123L, 12345678901234L, 123456789012345L,
      1234567890123456L, 12345678901234567L, 123456789012345678L,
      1234567890123456789L, 4611686018427387904L, Long.MaxValue)
    ids.foreach { i =>
      val h = graft.functions.Xxh3.hash64(i.toString.getBytes("UTF-8"))
      // unsigned decimal
      out.println(s"$i,${java.lang.Long.toUnsignedString(h)}")
    }
    out.close()
    println("wrote " + ids.size)
  }
}
