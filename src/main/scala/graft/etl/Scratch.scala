package graft.etl

import java.nio.file.{Files, Path, Paths}

/** Scratch directories for derived test lakes / stage hand-offs:
  * RAM-backed (/dev/shm) when available — the bench VM's disk
  * intermittently stalls for tens of seconds, randomly inflating
  * whichever query is mid-write (the same reason graft.Sessions puts
  * spark.local.dir on tmpfs). Data volumes at test SF are far below RAM;
  * at production scale these paths are real lake prefixes instead. */
object Scratch {
  def tempDir(prefix: String): Path = {
    val base =
      if (Files.isDirectory(Paths.get("/dev/shm"))) Paths.get("/dev/shm")
      else Paths.get(System.getProperty("java.io.tmpdir"))
    Files.createTempDirectory(base, prefix)
  }
}
