package graft.jobs

import java.io.{File, FileOutputStream}
import java.net.{HttpURLConnection, URI}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** S9/S10 ingest utilities — the reference's acquisition steps as library
  * functions (`/root/reference/scripts/00_download_tlc.py:13-17`,
  * `01_put_to_hdfs.sh:110-121`).
  *
  * Driver-side by design: acquisition moves ONE file per month between
  * systems; there is nothing to distribute. The cluster-side work starts at
  * EtlMain. `hdfsPut` goes through the Hadoop FileSystem API Spark already
  * ships, so the same code serves `hdfs://` in production and `file://` in
  * tests.
  */
object Ingest {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** S9: HTTP GET `url` into `dest` (atomic: temp file + rename). Returns
    * bytes written, or None when the source is missing and `skipMissing`
    * (the reference's 404-tolerant per-month loop, `00:105-113`). */
  def httpDownload(url: String, dest: File, skipMissing: Boolean = false): Option[Long] = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setInstanceFollowRedirects(true)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(300000)
    try {
      val code = conn.getResponseCode
      if (code >= 400) {
        if (skipMissing) { log.warn(s"source missing ($code), skipping: $url"); None }
        else throw new java.io.IOException(s"HTTP $code for $url")
      } else {
        Option(dest.getParentFile).foreach(_.mkdirs())
        val tmp = new File(dest.getParentFile, dest.getName + ".part")
        val in = conn.getInputStream
        val out = new FileOutputStream(tmp)
        try in.transferTo(out)
        finally { out.close(); in.close() }
        if (dest.exists()) dest.delete()
        if (!tmp.renameTo(dest))
          throw new java.io.IOException(s"rename failed: $tmp -> $dest")
        log.info(s"downloaded $url -> $dest (${dest.length()} bytes)")
        Some(dest.length())
      }
    } finally conn.disconnect()
  }

  /** S10: `hdfs dfs -mkdir -p` + `-put -f` via the FileSystem API —
    * mkdir the destination dir, copy the local file in, overwriting any
    * previous upload (the reference's idempotent `-f`). */
  def hdfsPut(conf: Configuration, local: File, destDir: String): Path = {
    val dir = new Path(destDir)
    val fs = FileSystem.get(dir.toUri, conf)
    fs.mkdirs(dir)
    val dest = new Path(dir, local.getName)
    fs.copyFromLocalFile(false /* keep src */, true /* overwrite */,
      new Path(local.getAbsolutePath), dest)
    log.info(s"put $local -> $dest")
    dest
  }
}
