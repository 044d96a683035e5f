package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.GraftLocalCheckpointFileManager
import org.scalatest.funsuite.AnyFunSuite

/** Contract pin for the round-16 NIO-fast-path checkpoint manager
  * (graft's local default — see SparkEnv.stateSession): the atomic
  * write protocol Spark's metadata logs and state stores rely on must
  * hold on the java.nio path exactly as on the Hadoop path. No
  * SparkSession needed — the manager is pure filesystem machinery.
  */
class CheckpointManagerSpec extends AnyFunSuite {

  private def withDir(f: (GraftLocalCheckpointFileManager, java.io.File) => Unit): Unit = {
    val root = new java.io.File(SparkEnv.scratchDir("ckpt-fm-spec"))
    val fm = new GraftLocalCheckpointFileManager(
      new Path(root.getAbsolutePath), new Configuration())
    f(fm, root)
  }

  private def readAll(fm: GraftLocalCheckpointFileManager, p: Path): String = {
    val in = fm.open(p)
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  test("createAtomic lands content readable through the manager, with no " +
      "temp or .crc residue") {
    withDir { (fm, root) =>
      val p = new Path(root.getAbsolutePath, "offsets/0")
      fm.mkdirs(p.getParent)
      val os = fm.createAtomic(p, overwriteIfPossible = false)
      os.write("v1\n{\"batchWatermarkMs\":0}".getBytes("UTF-8"))
      os.close()
      assert(fm.exists(p))
      assert(readAll(fm, p) == "v1\n{\"batchWatermarkMs\":0}")
      val leftovers = new java.io.File(root, "offsets").listFiles().map(_.getName)
        .filterNot(_ == "0")
      assert(leftovers.isEmpty, s"temp/.crc residue: ${leftovers.mkString(",")}")
    }
  }

  test("overwriteIfPossible=true atomically replaces existing content") {
    withDir { (fm, root) =>
      val p = new Path(root.getAbsolutePath, "state/1.delta")
      fm.mkdirs(p.getParent)
      val a = fm.createAtomic(p, overwriteIfPossible = true)
      a.write("first".getBytes("UTF-8")); a.close()
      val b = fm.createAtomic(p, overwriteIfPossible = true)
      b.write("second".getBytes("UTF-8")); b.close()
      assert(readAll(fm, p) == "second")
    }
  }

  test("overwriteIfPossible=false on an existing file throws Hadoop's " +
      "FileAlreadyExistsException (the lost-race signal HDFSMetadataLog " +
      "catches) and cleans the temp file") {
    withDir { (fm, root) =>
      val p = new Path(root.getAbsolutePath, "commits/0")
      fm.mkdirs(p.getParent)
      val a = fm.createAtomic(p, overwriteIfPossible = false)
      a.write("winner".getBytes("UTF-8")); a.close()
      val b = fm.createAtomic(p, overwriteIfPossible = false)
      b.write("loser".getBytes("UTF-8"))
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { b.close() }
      assert(readAll(fm, p) == "winner", "loser must not clobber the winner")
      val leftovers = new java.io.File(root, "commits").listFiles().map(_.getName)
        .filterNot(_ == "0")
      assert(leftovers.isEmpty, s"temp residue after lost race: ${leftovers.mkString(",")}")
    }
  }

  test("cancel discards the write and leaves no file") {
    withDir { (fm, root) =>
      val p = new Path(root.getAbsolutePath, "offsets/9")
      fm.mkdirs(p.getParent)
      val os = fm.createAtomic(p, overwriteIfPossible = false)
      os.write("abandoned".getBytes("UTF-8"))
      os.cancel()
      assert(!fm.exists(p))
      val leftovers = new java.io.File(root, "offsets").listFiles().map(_.getName)
      assert(leftovers.isEmpty, s"residue after cancel: ${leftovers.mkString(",")}")
    }
  }

  test("list through the parent manager sees NIO-written files (mixed-op " +
      "safety: Hadoop reads, NIO writes)") {
    withDir { (fm, root) =>
      val dir = new Path(root.getAbsolutePath, "offsets")
      fm.mkdirs(dir)
      (0 to 2).foreach { i =>
        val os = fm.createAtomic(new Path(dir, i.toString), overwriteIfPossible = false)
        os.write(s"batch$i".getBytes("UTF-8")); os.close()
      }
      val names = fm.list(dir).map(_.getPath.getName).sorted
      assert(names.toSeq == Seq("0", "1", "2"))
      fm.delete(new Path(dir, "1"))
      assert(fm.list(dir).map(_.getPath.getName).sorted.toSeq == Seq("0", "2"))
    }
  }
}
