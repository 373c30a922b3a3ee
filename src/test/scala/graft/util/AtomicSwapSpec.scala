package graft.util

import java.nio.file.{Files, Paths}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class AtomicSwapSpec extends AnyFunSuite {

  private def fs = new Path("/").getFileSystem(new Configuration())

  private def mkDir(content: String): String = {
    val d = Files.createTempDirectory("swap").toString + "/t"
    Files.createDirectories(Paths.get(d))
    Files.writeString(Paths.get(s"$d/data.txt"), content)
    d
  }

  test("swapIn replaces contents atomically and reaps scratch/backup") {
    val dir = mkDir("old")
    AtomicSwap.swapIn(fs, new Path(dir)) { tmp =>
      Files.createDirectories(Paths.get(tmp.toString))
      Files.writeString(Paths.get(s"$tmp/data.txt"), "new")
    }
    assert(Files.readString(Paths.get(s"$dir/data.txt")) === "new")
    assert(!Files.exists(Paths.get(AtomicSwap.tmpFor(new Path(dir)).toString)))
    assert(!Files.exists(Paths.get(AtomicSwap.backupFor(new Path(dir)).toString)))
  }

  test("a failed write leaves the live directory untouched") {
    val dir = mkDir("precious")
    intercept[RuntimeException] {
      AtomicSwap.swapIn(fs, new Path(dir)) { _ => throw new RuntimeException("boom") }
    }
    assert(Files.readString(Paths.get(s"$dir/data.txt")) === "precious",
      "live data must survive a failed rewrite")
  }

  test("recover restores a crash-stranded backup exactly once") {
    val dir = mkDir("v1")
    val p = new Path(dir)
    // simulate a crash between the two renames: live gone, backup present
    fs.rename(p, AtomicSwap.backupFor(p))
    assert(AtomicSwap.recover(fs, p), "recover must fire on a stranded backup")
    assert(Files.readString(Paths.get(s"$dir/data.txt")) === "v1")
    assert(!AtomicSwap.recover(fs, p), "a healthy dir must not re-recover")
  }

  test("scratch names are dot-prefixed so Spark listings ignore them") {
    val p = new Path("/tables/part=0")
    assert(AtomicSwap.tmpFor(p).getName.startsWith("."))
    assert(AtomicSwap.backupFor(p).getName.startsWith("."))
    assert(AtomicSwap.tmpFor(p).getParent.toString.endsWith("/tables"),
      "scratch must be a SIBLING, never a child of the swapped dir")
  }
}
