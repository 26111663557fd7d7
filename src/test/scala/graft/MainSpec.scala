package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** End-to-end CLI parity: the reference's golden run (`README.md:25-26`
  * inputs, `README.md:103-111` expected `mr-final.txt`) through
  * [[Main.run]]. The expected lines encode both the count semantics and
  * the desc-count/asc-word tie-break — of the four 1-count words
  * (a, goodbye, is, this) exactly the first two fit under k=5.
  */
class MainSpec extends SparkSpec {

  test("Main.run reproduces the reference's golden mr-final.txt") {
    val dir = Files.createTempDirectory("graft-main")
    val in1 = dir.resolve("input1.txt")
    val in2 = dir.resolve("input2.txt")
    // golden inputs, no trailing newline (as in the reference repo)
    Files.write(in1, "hello world hello this is a test".getBytes(StandardCharsets.UTF_8))
    Files.write(in2, "world goodbye hello test test world".getBytes(StandardCharsets.UTF_8))
    val out = dir.resolve("mr-final.txt")

    Main.run(spark, Seq(in1.toString, in2.toString), Main.K, out.toString)

    val got = new String(Files.readAllBytes(out), StandardCharsets.UTF_8)
    assert(got ===
      """hello: 3
        |test: 3
        |world: 3
        |a: 1
        |goodbye: 1
        |""".stripMargin)
  }
}
