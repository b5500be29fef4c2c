package graft.core

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Path, Paths}

/** Backup/restore of the durable warehouse as ONE tar archive — the
  * reference's `featurebase backup` / `restore` commands stream schema plus
  * per-shard data into a single tar the same way (`reference/ctl/backup.go`,
  * `reference/ctl/backup_tar.go` BackupTarCommand: one `io.Writer`, entries
  * `schema`, `indexes/<i>/shards/<n>`, …). Here the unit of state is the
  * warehouse directory ([[TableLog]] piece dirs + `manifest.json` per table
  * + `_ddlmeta.json`), so the archive is those files verbatim: a restore
  * into an empty warehouse dir followed by `Ddl.restoreSession` serves
  * identical query results.
  *
  * The tar writer/reader below is a minimal POSIX ustar implementation
  * (512-byte headers, octal size, content padded to block size) — the JDK
  * ships zip only, and a hand-rolled ustar keeps the archive readable by
  * standard `tar xf` like the reference's.
  *
  * Scale note: entries stream file-by-file through a bounded buffer —
  * backup memory is O(block), not O(table). The per-table manifest names
  * only live pieces, so a backup taken between writes is consistent; taking
  * it mid-write is guarded the same way the reference serializes with its
  * own write path (hold the server's write locks or quiesce ingest).
  */
object Backup {

  private val Block = 512

  // ------------------------------------------------------------------ write

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    // an overlong value would spill into the next header field and silently
    // corrupt the archive (ustar size caps at 8 GiB per file with 11 octal
    // digits) - fail loudly instead
    require(s.length <= width - 1,
      s"value $v overflows a $width-byte ustar octal field; " +
        "split the file or use a pax-format archiver")
    val padded = ("0" * (width - 1 - s.length)) + s + "\u0000"
    padded.getBytes(US_ASCII)
  }

  private def put(h: Array[Byte], off: Int, bytes: Array[Byte]): Unit =
    System.arraycopy(bytes, 0, h, off, bytes.length)

  private def header(name: String, size: Long, dir: Boolean): Array[Byte] = {
    val h = new Array[Byte](Block)
    val (prefix, base) =
      if (name.length <= 100) ("", name)
      else { // ustar prefix split at a '/' so long piece paths round-trip
        val cut = name.lastIndexWhere(_ == '/', 154)
        require(cut > 0 && name.length - cut - 1 <= 100, s"path too long for ustar: $name")
        (name.substring(0, cut), name.substring(cut + 1))
      }
    put(h, 0, base.getBytes(US_ASCII))
    put(h, 100, octal(420, 8))            // mode 0644
    put(h, 108, octal(0, 8))              // uid
    put(h, 116, octal(0, 8))              // gid
    put(h, 124, octal(if (dir) 0 else size, 12))
    put(h, 136, octal(System.currentTimeMillis() / 1000, 12))
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum placeholder
    h(156) = if (dir) '5'.toByte else '0'.toByte
    put(h, 257, "ustar\u000000".getBytes(US_ASCII)) // magic "ustar\\0" + version "00"
    if (prefix.nonEmpty) put(h, 345, prefix.getBytes(US_ASCII))
    val sum = h.map(b => b & 0xff).sum
    put(h, 148, (("0" * 6 + java.lang.Long.toOctalString(sum)).takeRight(6) + "\u0000 ")
      .getBytes(US_ASCII))
    h
  }

  /** Stream every regular file under `warehouse` into `tarOut` (paths
    * relative to the warehouse root). Returns the entry names written. */
  def backup(warehouse: String, tarOut: String): Seq[String] = {
    val root = Paths.get(warehouse)
    require(Files.isDirectory(root), s"warehouse dir not found: $warehouse")
    val out = new BufferedOutputStream(Files.newOutputStream(Paths.get(tarOut)))
    try {
      val entries = Seq.newBuilder[String]
      // hand-rolled walk instead of Files.walk: `_temporary` is Spark's
      // in-flight commit staging — by definition uncommitted state that
      // may VANISH mid-walk (found by the serving-path soak, twice: first
      // a disappearing staging .crc, then Files.walk itself throwing
      // UncheckedIOException when DESCENDING into a staging dir the
      // committer deleted between list and visit). A piece only becomes
      // engine state when its commit renames it out of _temporary, so
      // pruning the staging tree BEFORE descent — and treating any
      // directory that vanishes mid-list as empty — is exactly a
      // consistent snapshot.
      def walkFiles(dir: java.nio.file.Path,
                    acc: scala.collection.mutable.ListBuffer[java.nio.file.Path]): Unit = {
        val children =
          try {
            val s = Files.list(dir)
            try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator)
              .asScala.toList
            finally s.close()
          } catch {
            case _: java.nio.file.NoSuchFileException => Nil
            case e: java.io.UncheckedIOException
                if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] => Nil
          }
        children.foreach { p =>
          // NOFOLLOW: a symlink cycle under the root must not recurse
          // forever, and a symlinked dir is not engine state. Only regular
          // files enter the tar — sockets/broken links would abort the
          // stream with an IOException far from the cause
          if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
            if (p.getFileName.toString != "_temporary") walkFiles(p, acc)
          } else if (Files.isRegularFile(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
            acc += p
        }
      }
      val files = {
        val acc = scala.collection.mutable.ListBuffer[java.nio.file.Path]()
        walkFiles(root, acc)
        acc.toList.sortBy(_.toString)
      }
      files.foreach { f =>
        // committed files are immutable, but a concurrently-superseded piece
        // can still be GC'd between the walk and the read — skip, the
        // manifest never referenced it
        val ok = try {
          val rel = root.relativize(f).toString
          val size = Files.size(f)
          val in = new BufferedInputStream(Files.newInputStream(f))
          try {
            out.write(header(rel, size, dir = false))
            copy(in, out, size)
          } finally in.close()
          pad(out, size)
          Some(rel)
        } catch { case _: java.nio.file.NoSuchFileException => None }
        ok.foreach(entries += _)
      }
      out.write(new Array[Byte](Block * 2)) // end-of-archive
      entries.result()
    } finally out.close()
  }

  private def copy(in: InputStream, out: OutputStream, n: Long): Unit = {
    val buf = new Array[Byte](64 * 1024)
    var left = n
    while (left > 0) {
      val r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
      require(r > 0, "file truncated while archiving")
      out.write(buf, 0, r); left -= r
    }
  }

  private def pad(out: OutputStream, size: Long): Unit = {
    val rem = (size % Block).toInt
    if (rem != 0) out.write(new Array[Byte](Block - rem))
  }

  // ------------------------------------------------------------------- read

  private def str(h: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && h(end) != 0) end += 1
    new String(h, off, end - off, US_ASCII)
  }

  private def num(h: Array[Byte], off: Int, len: Int): Long = {
    val s = str(h, off, len).trim
    if (s.isEmpty) 0L else java.lang.Long.parseLong(s, 8)
  }

  /** Extract a backup archive into `destWarehouse` (created if missing).
    * Returns the entry names restored. Point `spark.graft.warehouse` at the
    * destination and call `Ddl.restoreSession` to serve the restored state. */
  def restore(tarIn: String, destWarehouse: String): Seq[String] = {
    val dest = Paths.get(destWarehouse)
    Files.createDirectories(dest)
    val in = new BufferedInputStream(Files.newInputStream(Paths.get(tarIn)))
    try {
      val entries = Seq.newBuilder[String]
      val h = new Array[Byte](Block)
      var done = false
      while (!done) {
        readFully(in, h)
        if (h.forall(_ == 0)) done = true
        else {
          val prefix = str(h, 345, 155)
          val name = (if (prefix.nonEmpty) prefix + "/" else "") + str(h, 0, 100)
          val size = num(h, 124, 12)
          val typeflag = h(156).toChar
          val target = dest.resolve(name).normalize()
          require(target.startsWith(dest), s"archive entry escapes dest: $name")
          if (typeflag == '0' || typeflag == 0) {
            Files.createDirectories(target.getParent)
            val out = new BufferedOutputStream(Files.newOutputStream(target))
            try copy(in, out, size) finally out.close()
            skip(in, (Block - size % Block) % Block)
            entries += name
          } else skip(in, size + (Block - size % Block) % Block)
        }
      }
      entries.result()
    } finally in.close()
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      require(r > 0, "unexpected end of archive")
      off += r
    }
  }

  private def skip(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { require(in.read() >= 0, "unexpected end of archive"); left -= 1 }
      else left -= s
    }
  }

  /** CLI: `runMain graft.core.Backup backup <warehouseDir> <out.tar>` or
    * `restore <in.tar> <warehouseDir>` — the `featurebase backup`/`restore`
    * command-line shape (`reference/ctl/backup.go`, `restore.go`). */
  def main(args: Array[String]): Unit = args.toList match {
    case "backup" :: wh :: out :: Nil =>
      val n = backup(wh, out).length
      println(s"[graft-backup] $n entries -> $out")
    case "restore" :: in :: wh :: Nil =>
      val n = restore(in, wh).length
      println(s"[graft-backup] $n entries restored -> $wh")
    case other =>
      System.err.println(s"usage: backup <warehouseDir> <out.tar> | restore <in.tar> <warehouseDir> (got: $other)")
      sys.exit(2)
  }
}
