package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.{
  CheckpointFileManager, FileContextBasedCheckpointFileManager,
  FileSystemBasedCheckpointFileManager, GraftLocalCheckpointFileManager}

/** Dev-only micro-probe (round-16): isolate the per-checkpoint-log
  * write cost the StreamPhaseProf phase table shows as ~40 ms each for
  * walCommit / commitOffsets / the file-source metadata log — on
  * tmpfs, where the raw byte write is microseconds. Times the
  * HDFSMetadataLog-shaped op sequence (exists + createAtomic write +
  * rename-on-close) under the default FileContext-based manager, the
  * FileSystem-based manager, and a raw java.nio write as the floor.
  * No SparkSession needed — this is pure Hadoop-FS/OS work.
  *
  *   sbt "runMain graft.tools.WalWriteProbe"
  */
object WalWriteProbe {
  def main(args: Array[String]): Unit = {
    val n = 60
    val payload = ("v1\n" + ("x" * 400) + "\n").getBytes("UTF-8")
    val root = new java.io.File("/dev/shm/graft-walprobe-" +
      java.util.UUID.randomUUID().toString.take(8))
    root.mkdirs()
    val conf = new Configuration()
    def bench(tag: String, fm: CheckpointFileManager, dir: String): Unit = {
      val d = new Path(root.getAbsolutePath, dir)
      fm.mkdirs(d)
      // warm the manager (class init, FS cache)
      val w = fm.createAtomic(new Path(d, "warm"), true); w.write(payload); w.close()
      val times = (1 to n).map { i =>
        val p = new Path(d, i.toString)
        val t0 = System.nanoTime()
        val already = fm.exists(p) // the metadata-log get-before-add
        val os = fm.createAtomic(p, true)
        os.write(payload)
        os.close() // rename happens here
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$tag%-28s min=${times.head}%7.3f ms  p50=${times(n / 2)}%7.3f  " +
        f"p90=${times((n * 9) / 10)}%7.3f  max=${times.last}%7.3f")
    }
    bench("FileContextBased (default)",
      new FileContextBasedCheckpointFileManager(
        new Path(root.getAbsolutePath), conf), "fc")
    bench("FileSystemBased",
      new FileSystemBasedCheckpointFileManager(
        new Path(root.getAbsolutePath), conf), "fs")
    bench("GraftLocal (nio fast path)",
      new GraftLocalCheckpointFileManager(
        new Path(root.getAbsolutePath), conf), "nio")
    // raw-NIO floor: write + fsync-equivalent + atomic move
    val rawDir = new java.io.File(root, "raw"); rawDir.mkdirs()
    val rawTimes = (1 to n).map { i =>
      val t0 = System.nanoTime()
      val tmp = new java.io.File(rawDir, s".$i.tmp").toPath
      java.nio.file.Files.write(tmp, payload)
      java.nio.file.Files.move(tmp, new java.io.File(rawDir, i.toString).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"${"raw nio write+move"}%-28s min=${rawTimes.head}%7.3f ms  " +
      f"p50=${rawTimes(n / 2)}%7.3f  p90=${rawTimes((n * 9) / 10)}%7.3f  " +
      f"max=${rawTimes.last}%7.3f")
    graft.SparkEnv.deleteDir(root.getAbsolutePath)
  }
}
