package graft.tools

/** Tiny main for verifying that a `runMain` JSON summary line is the
  * PHYSICALLY LAST stdout line under `sbt -batch` (no `[success]`
  * trailer, no log decoration) — the contract the driver's bench-tail
  * parse depends on. Prints one JSON line and exits. */
object StdoutProbe {
  def main(args: Array[String]): Unit =
    println("""{"metric":"probe","value":1}""")
}
