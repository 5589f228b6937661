package graft.tools
import graft.operators.Mp3
object Mp3Prof {
  def main(args: Array[String]): Unit = {
    for (id <- 0L until 5L) { val b = Mp3.encode(id); Mp3.decode(b); Mp3.prError(id) }
    def time(n: Int)(f: Long => Unit): Double = {
      val t0 = System.nanoTime(); for (i <- 0 until n) f(13L + 29L * i); (System.nanoTime() - t0) / 1e6 / n
    }
    val tEnc = time(50)(id => Mp3.encode(id))
    val encs = (0 until 50).map(i => Mp3.encode(13L + 29L * i))
    val t0 = System.nanoTime(); encs.foreach(Mp3.decode); val tDec = (System.nanoTime() - t0) / 1e6 / 50
    val tPr = time(50)(id => Mp3.prError(id))
    println(f"encode $tEnc%.2f ms/id  decode $tDec%.2f ms/id  prError $tPr%.2f ms/id")
  }
}
