package graft

import org.apache.spark.unsafe.types.UTF8String

/** Scratch microbenchmark for the scan-stage text kernels (dev tool,
  * r21 optimization round): per-op ns over a ~500-char ASCII doc.
  * Established normalizeText 3161 → ~800-1200 ns/op with the ASCII
  * fast path, and that byte-loop variants of the fingerprint kernels
  * were NOT faster than their char loops (reverted). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val text = ("the quick brown fox jumps over the lazy dog " * 12).trim
    val u = UTF8String.fromString(text)
    def time(name: String)(f: => Unit): Unit = {
      var i = 0; while (i < 20000) { f; i += 1 } // warm
      val t0 = System.nanoTime(); i = 0
      while (i < 200000) { f; i += 1 }
      println(f"$name: ${(System.nanoTime() - t0) / 200000.0}%.0f ns/op")
    }
    time("portableFingerprint")(graft.functions.TextKernelOps.compute(u))
    time("normalizeText")(graft.functions.NormalizeTextOps.compute(u))
    time("windowFps(8)")(graft.functions.WindowFingerprintOps.compute(u, 8))
    val wsRegex = java.util.regex.Pattern.compile("\\s+")
    time("tokens regex split (ref)") {
      val parts = wsRegex.split(text.trim, -1)
      var c = 0; var i = 0
      while (i < parts.length) { if (parts(i).nonEmpty) c += 1; i += 1 }
    }
    time("whitespaceTokens kernel")(graft.functions.WhitespaceTokensOps.compute(u))
    time("whitespaceTokenCount kernel")(graft.functions.WhitespaceTokensOps.count(u))
  }
}
