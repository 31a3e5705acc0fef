package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/**
 * Output sinks (SURVEY.md §2.1 S15/S16).
 *
 * S15 — the reference emits folder-labeled image trees
 * (`<dataset>/<label>/<name>.jpg`, make_original.py:31-36 etc.). The
 * engine's primary sink is the labeled TABLE partitioned by label/split
 * (`mode("overwrite")` replaces the reference's cleandir,
 * lib/helpers.py:21-27); `writeFolderTree` materializes the reference's
 * exact on-disk layout from that table for tooling parity.
 *
 * S16 — `.tar` packing (make_original.py:57-62). Deterministic minimal
 * ustar writer (sorted entries, zeroed mtime) so archives are
 * byte-reproducible; driver-side by design — packing is IO concatenation,
 * not distributed compute.
 */
object Sinks {
  /** S15 primary form: labeled output table partitioned by label (and
    * split when present). */
  def writeLabeledTable(out: DataFrame, path: String): Unit = {
    val cols = out.columns.toSet
    val parts = Seq("label", "split").filter(cols.contains)
    out.write.mode("overwrite").partitionBy(parts: _*).parquet(path)
  }

  /** S15 folder form: `<dir>/<label>/<example_id>.<ext>` (reference layout;
    * `<dir>/<split>/<label>/...` when a split column exists). Collects via
    * toLocalIterator — a driver-side export utility, not a distributed op. */
  def writeFolderTree(out: DataFrame, dir: String): Unit = {
    // reference cleandir semantics (helpers.py:21-27): the tree is rebuilt
    // from scratch so stale files from a previous export never linger.
    // Wipe guard: only a tree that LOOKS like a previous export (nothing
    // but .jpg/.png leaves, plus a .tar that tarDirectory may legitimately
    // have written inside it) is deleted — a mistyped or shared path with
    // unrelated data aborts instead of silently losing it.
    val rootPath = Paths.get(dir)
    if (Files.isDirectory(rootPath)) {
      val check = Files.walk(rootPath)
      val foreign =
        try check.filter(Files.isRegularFile(_)).toArray.map(_.toString)
          .filterNot(p => p.endsWith(".jpg") || p.endsWith(".png") || p.endsWith(".tar"))
        finally check.close()
      require(foreign.isEmpty,
        s"writeFolderTree refuses to wipe $dir: non-export files present " +
          s"(e.g. ${foreign.take(3).mkString(", ")})")
      val all = Files.walk(rootPath)
      try all.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally all.close()
    }
    val hasSplit = out.columns.contains("split")
    val cols = Seq("example_id", "label", "bytes", "fmt") ++ (if (hasSplit) Seq("split") else Nil)
    val it = out.select(cols.map(col): _*).toLocalIterator()
    while (it.hasNext) {
      val r = it.next()
      val ext = r.getAs[String]("fmt") match { case "png" => "png"; case _ => "jpg" }
      val sub = if (hasSplit && r.getAs[String]("split") != "all")
        s"${r.getAs[String]("split")}/${r.getAs[String]("label")}"
      else r.getAs[String]("label")
      val p = Paths.get(dir, sub, s"${r.getAs[String]("example_id")}.$ext")
      Files.createDirectories(p.getParent)
      Files.write(p, r.getAs[Array[Byte]]("bytes"))
    }
  }

  /** S16: pack a directory tree into a deterministic ustar archive. */
  def tarDirectory(dir: String, tarPath: String): Unit = {
    val root = Paths.get(dir)
    // list BEFORE creating the archive and exclude it explicitly — a
    // tarPath inside dir would otherwise pack the half-written archive
    // into itself; close the walk stream (it holds directory fds)
    val tarAbs = Paths.get(tarPath).toAbsolutePath.normalize
    val walk = Files.walk(root)
    val files =
      try walk.filter(Files.isRegularFile(_))
        .toArray.map(_.asInstanceOf[Path]).sortBy(_.toString)
        .filterNot(_.toAbsolutePath.normalize == tarAbs)
      finally walk.close()
    val out = new BufferedOutputStream(new FileOutputStream(tarPath))
    try {
      for (f <- files) {
        val rel = root.getParent match {
          case null => f.toString
          case p => p.relativize(f).toString
        }
        val data = Files.readAllBytes(f)
        out.write(ustarHeader(rel, data.length))
        out.write(data)
        val pad = (512 - data.length % 512) % 512
        out.write(new Array[Byte](pad))
      }
      out.write(new Array[Byte](1024)) // two zero blocks = end of archive
    } finally out.close()
  }

  private def ustarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int, len: Int): Unit = {
      val b = s.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(b, 0, h, off, math.min(b.length, len))
    }
    require(name.getBytes(StandardCharsets.US_ASCII).length < 100, s"name too long: $name")
    put(name, 0, 100)
    put("0000644", 100, 7)                        // mode (NUL-terminated by the zeroed array)
    put("0000000", 108, 7)                        // uid
    put("0000000", 116, 7)                        // gid
    put(f"$size%011o", 124, 11)                   // size (octal)
    put("00000000000", 136, 11)                   // mtime = 0 (deterministic)
    put("        ", 148, 8)                       // checksum field = spaces while summing
    h(156) = '0'                                  // typeflag: regular file
    put("ustar", 257, 5)                          // magic (NUL at 262 from zeroed array)
    put("00", 263, 2)                             // version
    val checksum = h.foldLeft(0L)((a, b) => a + (b & 0xFF))
    put(f"$checksum%06o", 148, 6)
    h(154) = 0                                    // POSIX: 6 octal digits, NUL, space
    h(155) = ' '
    h
  }
}
