package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.slf4j.LoggerFactory

class ColorLogSpec extends AnyFunSuite {

  private val noColorEnv = sys.env.contains("NO_COLOR")

  test("colored() wraps with the termcolor ANSI codes (color + attrs)") {
    assume(!noColorEnv)
    val l = ColorLog(LoggerFactory.getLogger("t"), "cyan", Seq("bold"))
    assert(l.colored("x") == "\u001b[36m\u001b[1mx\u001b[0m")
    val plain = ColorLog(LoggerFactory.getLogger("t"), "red", Seq())
    assert(plain.colored("y") == "\u001b[31my\u001b[0m")
  }

  test("unknown colors/attrs are refused; all level methods delegate") {
    intercept[IllegalArgumentException](
      ColorLog(LoggerFactory.getLogger("t"), "mauve"))
    intercept[IllegalArgumentException](
      ColorLog(LoggerFactory.getLogger("t"), "red", Seq("sparkly")))
    val l = ColorLog(LoggerFactory.getLogger("t"), "green")
    // must not throw; formatting applies only when args are present
    l.debug("d"); l.info("i %d", 1); l.warn("w"); l.warning("w2")
    l.error("e"); l.critical("c"); l.exception("x", new RuntimeException("r"))
  }
}
