package graft.config

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import java.util.logging.{ConsoleHandler, FileHandler, Formatter, Level, LogManager, LogRecord, Logger}

/** Run logging configuration (reference: ons_utils/config/config.py:225-304
  * `LoggingConfig`): a per-run id derived from the start timestamp, a log
  * directory resolved under the user's home (created on demand), the full
  * log-file path for the run, and the handler/formatter wiring
  * (`set_logging_config`, config.py:252-304). The reference drives
  * Python's `logging.dictConfig`; the JVM analog here is twofold:
  * [[setLoggingConfig]] wires `java.util.logging` directly (console at
  * INFO + run file at DEBUG, formatter ids `basic`/`debug` matching the
  * reference's), and [[log4j2Properties]] renders the equivalent log4j2
  * properties for applications on that backend.
  */
class RunLog(baseDir: Option[Path] = None,
             clock: () => ZonedDateTime = () => ZonedDateTime.now(ZoneOffset.UTC)) {

  /** e.g. `20260812_143055` — sortable, filesystem-safe. */
  val logId: String = clock().format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))

  val logDir: Path =
    baseDir.getOrElse(Paths.get(sys.props("user.home"), "graft", "logs"))

  val logPath: Path = logDir.resolve(s"run_$logId.log")

  /** Create the directory tree and return the log file path. */
  def ensure(): Path = {
    Files.createDirectories(logDir)
    logPath
  }

  /** The reference's two formatter ids (config.py:293-301): `basic` is
    * message-only, `debug` prefixes timestamp/level/source.
    */
  private def julFormatter(id: String): Formatter = id match {
    case "basic" => new Formatter {
      override def format(r: LogRecord): String = formatMessage(r) + "\n"
    }
    case "debug" => new Formatter {
      private val ts = DateTimeFormatter.ofPattern("yy/MM/dd HH:mm:ss")
        .withZone(ZoneOffset.UTC)
      override def format(r: LogRecord): String =
        s"[${ts.format(r.getInstant)} ${r.getLevel} - ${r.getLoggerName}] " +
          formatMessage(r) + "\n"
    }
    case other => throw new IllegalArgumentException(
      s"unknown formatter id: $other (expected basic|debug)")
  }

  /** Wire the root logger: console handler at INFO with the `console`
    * formatter, run-file handler at DEBUG with the `textLog` formatter
    * (fresh file per run, like the reference's `mode: 'w'`). Existing
    * root handlers are ALWAYS replaced (and closed — no duplicated
    * console lines, no leaked file descriptors on re-configuration),
    * matching `dictConfig`'s root-handler semantics;
    * `disableOtherLoggers` mirrors `disable_existing_loggers` by
    * additionally resetting every non-root logger's level/handlers via
    * `LogManager.reset()` first. Returns the configured root logger;
    * callers log through their usual slf4j/JUL loggers.
    */
  def setLoggingConfig(console: String = "basic", textLog: String = "debug",
                       disableOtherLoggers: Boolean = false): Logger = {
    ensure()
    if (disableOtherLoggers) LogManager.getLogManager.reset()
    val root = LogManager.getLogManager.getLogger("")
    root.getHandlers.foreach { h => root.removeHandler(h); h.close() }
    val ch = new ConsoleHandler()
    ch.setLevel(Level.INFO)
    ch.setFormatter(julFormatter(console))
    val fh = new FileHandler(logPath.toString, /*append=*/ false)
    fh.setLevel(Level.ALL)
    fh.setFormatter(julFormatter(textLog))
    root.addHandler(ch)
    root.addHandler(fh)
    // Root stays at INFO (the reference's root-logger level,
    // config.py:273-277). Raising it to ALL would enable FINE logging in
    // third-party code — notably Janino, whose debug path breaks Spark
    // whole-stage codegen. Loggers that want DEBUG in the run file set
    // their own level; the file handler accepts everything.
    root.setLevel(Level.INFO)
    root
  }

  /** Render the equivalent log4j2 properties (console INFO + file DEBUG
    * appenders on the run file) for applications configuring log4j2 from
    * a properties file instead of JUL.
    */
  def log4j2Properties(console: String = "basic", textLog: String = "debug"): String = {
    def pattern(id: String): String = id match {
      case "basic" => "%m%n"
      case "debug" => "[%d{yy/MM/dd HH:mm:ss} %p - file=%F:%L] %m%n"
      case other => throw new IllegalArgumentException(
        s"unknown formatter id: $other (expected basic|debug)")
    }
    // Root stays at INFO for the same reason setLoggingConfig pins it
    // there: a DEBUG root turns on third-party debug paths (Janino's
    // breaks Spark codegen) and floods the file appender. Loggers that
    // want DEBUG in the run file raise their own logger level.
    s"""status = warn
       |appender.console.type = Console
       |appender.console.name = console
       |appender.console.layout.type = PatternLayout
       |appender.console.layout.pattern = ${pattern(console)}
       |appender.console.filter.threshold.type = ThresholdFilter
       |appender.console.filter.threshold.level = info
       |appender.file.type = File
       |appender.file.name = file_log
       |appender.file.fileName = ${logPath.toString}
       |appender.file.append = false
       |appender.file.layout.type = PatternLayout
       |appender.file.layout.pattern = ${pattern(textLog)}
       |rootLogger.level = info
       |rootLogger.appenderRef.console.ref = console
       |rootLogger.appenderRef.file.ref = file_log
       |""".stripMargin
  }

  /** Write [[log4j2Properties]] next to the run log and return its path. */
  def writeLog4j2Properties(console: String = "basic", textLog: String = "debug"): Path = {
    ensure()
    val p = logDir.resolve(s"log4j2_$logId.properties")
    Files.writeString(p, log4j2Properties(console, textLog))
    p
  }
}
