package graft.sinks

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test filesystem (`flaky://`) whose RENAME of manifest publishes is
  * deliberately broken in the ways real object stores break it —
  * the injected-FS harness ObjectStoreContractSpec drives
  * [[VersionedLake.writeManifest]]'s non-local publish path through:
  *
  *  - `atomic`      POSIX rename (the baseline; local FS semantics)
  *  - `copy`        copy-then-delete (S3A-style emulated rename that
  *                  COMPLETES — slower, but the commit lands whole)
  *  - `partial`     copy HALF the bytes, report success (a rename that
  *                  died midway but was acknowledged — the torn-
  *                  manifest case the read-back verify must catch)
  *  - `falseAfterCopy`  copy everything, report FAILURE (crash between
  *                  copy and source delete — the destination is a
  *                  complete, durable commit the writer was never told
  *                  about)
  *  - `blindProbe`  `exists()` on manifests answers FALSE — the
  *                  SIMULTANEOUS-complete-copy schedule: a second
  *                  writer whose existence probe ran before the first
  *                  writer's copy landed. Its rename then REPLACES the
  *                  first writer's acknowledged commit (this store's
  *                  rename is plain POSIX = replace-capable), and its
  *                  read-back sees its own bytes — the history fork
  *                  rename-class stores cannot prevent, which
  *                  [[CondCreateFs]]'s conditional create serializes.
  *
  * Only paths under `_versions/` are affected (data writes and the
  * committer's task-dir renames stay POSIX), so a single mode switch
  * targets exactly the publish under test. Mode is a process-global
  * because Hadoop instantiates filesystems reflectively and caches
  * them per scheme.
  */
class FlakyRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")

  override def exists(p: Path): Boolean =
    if (FlakyRenameFs.mode == "blindProbe" &&
        p.toString.contains("_versions") && p.getName.endsWith(".txt"))
      false // the racing writer's probe ran before the winner landed
    else super.exists(p)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!dst.toString.contains("_versions"))
      return super.rename(src, dst)
    FlakyRenameFs.mode match {
      case "atomic" | "blindProbe" => super.rename(src, dst)
      case "copy" =>
        copyBytes(src, dst, all = true)
        delete(src, false)
      case "partial" =>
        copyBytes(src, dst, all = false)
        delete(src, false): Unit
        true // the store SAID the rename succeeded
      case "falseAfterCopy" =>
        copyBytes(src, dst, all = true)
        false // crash before the source delete: caller sees failure
      case m => throw new IllegalStateException(s"unknown flaky mode $m")
    }
  }

  private def copyBytes(src: Path, dst: Path, all: Boolean): Unit = {
    val in = open(src)
    val bytes =
      try org.apache.commons.io.IOUtils.toByteArray(in)
      finally in.close()
    val n = if (all) bytes.length else bytes.length / 2
    val out = create(dst, true)
    try out.write(bytes, 0, n)
    finally out.close()
  }
}

object FlakyRenameFs {
  @volatile var mode: String = "atomic"
}

/** Test store (`condstore://`) advertising the ATOMIC CONDITIONAL
  * CREATE capability ([[AtomicCreateStore]], the S3 `If-None-Match: *`
  * PUT shape) on top of [[FlakyRenameFs]]'s broken renames — the store
  * class where the manifest publish goes through `createExclusive`
  * instead of rename, so even the `blindProbe` simultaneous-complete-
  * copy schedule serializes: exactly one writer's create wins, the
  * rest get the already-committed refusal and rebase.
  */
class CondCreateFs extends FlakyRenameFs with graft.sinks.AtomicCreateStore {
  override def getScheme: String = "condstore"
  override def getUri: URI = URI.create("condstore:///")

  override def createExclusive(p: Path, bytes: Array[Byte]): Boolean = {
    val nio = java.nio.file.Paths.get(p.toUri.getPath)
    java.nio.file.Files.createDirectories(nio.getParent): Unit
    try {
      java.nio.file.Files.write(nio, bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW): Unit
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }
}
