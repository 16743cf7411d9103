package graft.config

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

/** Run logging configuration (reference: ons_utils/config/config.py:225-304
  * `LoggingConfig`): a per-run id derived from the start timestamp, a log
  * directory resolved under the user's home (created on demand), and the
  * full log-file path for the run. The reference wires this into Python's
  * logging module; here the paths are handed to whatever logging backend
  * the application uses (log4j2 properties, slf4j file appender).
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
}
