package graft.util

import org.slf4j.{Logger, LoggerFactory}

/** Colored console logger — parity for the reference's `ColorLog`
  * wrapper (`color_log/color_log.py:6-35`): a per-instance
  * (color, attrs) pair applied to every message before delegating to
  * the underlying logger, exactly the reference's
  * `colored(s, color, attrs)` + `logging.Logger` composition, restated
  * over slf4j/log4j2 (the engine's logging stack).
  *
  * ANSI sequences follow termcolor's tables (the library the reference
  * wraps): colors 30-37, attributes bold/dark/underline/blink/reverse/
  * concealed. Coloring is suppressed when the `NO_COLOR` convention is
  * set in the environment — logs piped to files stay clean.
  *
  *   val log = ColorLog(LoggerFactory.getLogger("graft"), "cyan")
  *   log.info("starting pass %d", 3)
  */
final case class ColorLog(log: Logger, color: String = "white",
    attrs: Seq[String] = Seq("bold")) {

  private val colors = Map(
    "grey" -> 30, "red" -> 31, "green" -> 32, "yellow" -> 33,
    "blue" -> 34, "magenta" -> 35, "cyan" -> 36, "white" -> 37)
  private val attributes = Map(
    "bold" -> 1, "dark" -> 2, "underline" -> 4, "blink" -> 5,
    "reverse" -> 7, "concealed" -> 8)
  require(colors.contains(color), s"unknown color '$color'")
  require(attrs.forall(attributes.contains),
    s"unknown attr in ${attrs.mkString(",")}")

  private val enabled = !sys.env.contains("NO_COLOR")

  /** The reference's `colored(...)` — exposed so callers (and the
    * spec) can colorize without logging.
    */
  def colored(s: String): String =
    if (!enabled) s
    else {
      val codes = colors(color) +: attrs.map(attributes)
      codes.map(c => s"\u001b[${c}m").mkString + s + "\u001b[0m"
    }

  private def fmt(s: String, args: Seq[Any]): String =
    if (args.isEmpty) s else s.format(args: _*)

  def debug(s: String, args: Any*): Unit = log.debug(colored(fmt(s, args)))
  def info(s: String, args: Any*): Unit = log.info(colored(fmt(s, args)))
  def warn(s: String, args: Any*): Unit = log.warn(colored(fmt(s, args)))
  /** Python-logging alias kept for surface parity. */
  def warning(s: String, args: Any*): Unit = warn(s, args: _*)
  def error(s: String, args: Any*): Unit = log.error(colored(fmt(s, args)))
  /** `exception`/`critical` map onto slf4j's error level, as the
    * reference's both delegate to the stdlib logger's severe path.
    */
  def exception(s: String, t: Throwable): Unit =
    log.error(colored(s), t)
  def critical(s: String, args: Any*): Unit = error(s, args: _*)
}

object ColorLog {
  /** The reference module's ready-made default instance. */
  val log: ColorLog = ColorLog(LoggerFactory.getLogger("graft"))
}
