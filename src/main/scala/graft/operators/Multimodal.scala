package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The default codec (`decodeImageIO`) probes real payloads in all
  * three modalities — images with `javax.imageio`, audio with the
  * RIFF/WAVE header walk, video with the RIFF/AVI main-header walk
  * and the ISO BMFF (mp4/mov) box walk —
  * always a header-only read of dimensions/duration + format, never
  * a full pixel/sample decode, which is the correct scale behavior
  * for multi-MB payloads. Payloads no probe recognizes fall back to
  * `decodeStub`'s deterministic hash-derived features, so the
  * pipeline shape stays testable with synthetic corpora. Everything
  * around the codec — the schema, the typed Dataset plumbing, the
  * batched `mapPartitions` shape (codec setup amortizes per batch),
  * and the repartition-for-parallel-decode step — is codec-agnostic:
  * an ffmpeg-style binding for non-RIFF containers drops in as
  * another `Codec` function.
  */
object Multimodal {

  /** Default ViT patch edge (pixels) for [[patchTokens]]/[[videoTokens]]
    * — ONE constant, interpolated into the SQL function registrations
    * too, so the Scala and SQL costing rules cannot drift. */
  val DefaultPatchSize = 16

  /** Default speech-encoder rate (tokens/second) for [[audioTokens]]. */
  val DefaultAudioTokensPerSecond = 50

  /** The codec contract: one batch of payloads in, features out. */
  type Codec = Seq[MediaItem] => Seq[MediaFeatures]

  /** A media row: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded features (width/height for images, duration for a/v).
    * `format` is the codec-reported container format (e.g. "png",
    * "jpeg"); "synthetic" marks stub-derived features.
    */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      sha256: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      format: String)

  /** Build a media table from any table with an id + string payload
    * column — the corpus has no true binary media, so documents.text
    * stands in as payload bytes (UTF-8). Kind assignment is a
    * deterministic id-based rotation.
    */
  def mediaTable(df: DataFrame, idCol: String, payloadCol: String, sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("bigint").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      col(sourceCol).as("source"))

  /** ======= STUB FALLBACK =======
    * Deterministic fake decode: dimensions and duration derived from
    * payload length/hash. Serves payloads no real probe recognizes
    * (synthetic text-as-bytes corpora; non-RIFF a/v containers
    * without an ffmpeg binding) so the pipeline stays total and
    * reproducible.
    */
  def decodeStub(batch: Seq[MediaItem]): Seq[MediaFeatures] =
    batch.map { m =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(m.payload).map("%02x".format(_)).mkString
      val h = java.util.Arrays.hashCode(m.payload)
      MediaFeatures(
        media_id = m.media_id,
        kind = m.kind,
        n_bytes = m.payload.length.toLong,
        sha256 = sha,
        width = 64 + math.floorMod(h, 1024),
        height = 64 + math.floorMod(h >> 10, 1024),
        duration_ms = if (m.kind == "image") 0L else 1000L + math.floorMod(h, 60000).toLong,
        format = "synthetic")
    }

  /** Synthesize a REAL `width`×`height` PNG payload (flat-color RGB,
    * in-memory `javax.imageio` encode) — the fixture-side generator
    * that lets a corpus with no binary media exercise the REAL
    * [[probeImage]] decode path end-to-end: generate at known
    * dimensions, probe, and verify the probe returns them. Small and
    * deterministic (a flat image deflates to ~a few hundred bytes at
    * any admissible size).
    */
  def synthesizePng(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width.toLong * height <= (1L << 22),
      s"synthetic PNG dims out of range: ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthesize a REAL RIFF/WAVE payload of `durationMs` milliseconds
    * (8 kHz, mono, 8-bit PCM — byteRate 8000, so the data chunk is
    * exactly `8·ms` bytes and [[probeWav]] recovers the duration
    * EXACTLY for any ms). Deterministic silence; the audio analog of
    * [[synthesizePng]] for exercising the real decode path
    * end-to-end on a corpus with no binary media.
    */
  def synthesizeWav(durationMs: Long): Array[Byte] = {
    require(durationMs >= 0 && durationMs <= 3600000L,
      s"synthetic WAV duration out of range: $durationMs ms")
    val byteRate = 8000 // 8000 Hz × 1 channel × 1 byte/sample
    val dataSize = (durationMs * byteRate / 1000L).toInt
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)            // PCM, mono
      .putInt(8000).putInt(byteRate)      // sample rate, byte rate
      .putShort(1).putShort(8)            // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    // 8-bit PCM silence is 0x80
    var i = 0
    while (i < dataSize) { buf.put(0x80.toByte); i += 1 }
    buf.array()
  }

  /** Header-only WAV probe: (duration_ms, "wav") from the RIFF
    * header — `fmt ` chunk's byte rate and the `data` chunk size,
    * `durationMs = dataSize·1000 / byteRate` (integer floor; exact
    * whenever 1000 divides `dataSize·1000`, in particular always for
    * [[synthesizeWav]] payloads). None for anything that is not a
    * well-formed RIFF/WAVE — the caller falls back to the stub, the
    * probe never throws on arbitrary bytes (chunk walk is
    * bounds-checked).
    */
  def probeWav(bytes: Array[Byte]): Option[Long] = {
    if (bytes.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return None
    var off = 12
    var byteRate = 0L
    var dataSize = -1L
    while (off + 8 <= bytes.length && (byteRate == 0L || dataSize < 0L)) {
      val id = ascii(off, 4)
      val size = b.getInt(off + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 16 + 8 <= bytes.length)
        byteRate = b.getInt(off + 8 + 8).toLong & 0xffffffffL
      if (id == "data") dataSize = size
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 16 || off < 0) return None
    }
    if (byteRate <= 0L || dataSize < 0L) None
    else Some(dataSize * 1000L / byteRate)
  }

  /** Synthesize a REAL RIFF/AVI header payload: `RIFF('AVI ')`
    * containing `LIST(hdrl)` with the standard 56-byte `avih` main
    * header (µs/frame, total frames, width, height — the public
    * AVI main-header layout) and an empty `LIST(movi)`. Not a
    * playable movie (no stream data — the video analog of a
    * header-only probe target), but byte-for-byte the real container
    * format a header walk parses. Completes the synthesize-probe
    * round-trip pattern for the third modality.
    */
  def synthesizeAvi(
      width: Int, height: Int, totalFrames: Int,
      usPerFrame: Int = 33333): Array[Byte] = {
    require(width >= 1 && height >= 1 && totalFrames >= 1 && usPerFrame >= 1,
      s"synthetic AVI params out of range: ${width}x$height, " +
        s"$totalFrames frames @ $usPerFrame us")
    // RIFF(4+ (LIST hdrl: 8+4+8+56) + (LIST movi: 8+4)) — fixed sizes
    val hdrlSize = 4 + 8 + 56
    val riffSize = 4 + (8 + hdrlSize) + (8 + 4)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffSize)
      .put("AVI ".getBytes("US-ASCII"))
      .put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
      .put("hdrl".getBytes("US-ASCII"))
      .put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(usPerFrame)   // dwMicroSecPerFrame
      .putInt(0)            // dwMaxBytesPerSec
      .putInt(0)            // dwPaddingGranularity
      .putInt(0)            // dwFlags
      .putInt(totalFrames)  // dwTotalFrames
      .putInt(0)            // dwInitialFrames
      .putInt(1)            // dwStreams
      .putInt(0)            // dwSuggestedBufferSize
      .putInt(width)        // dwWidth
      .putInt(height)       // dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      .put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("movi".getBytes("US-ASCII"))
    buf.array()
  }

  /** Header-only AVI probe: (width, height, duration_ms) from the
    * `avih` main header — `duration = µsPerFrame · totalFrames /
    * 1000` (integer floor; exact whenever 1000 divides the product).
    * Walks `RIFF('AVI ')` top-level chunks, descends the `hdrl`
    * LIST; None for anything that is not a well-formed AVI header
    * (bounds-checked, never throws on arbitrary bytes).
    */
  def probeAvi(bytes: Array[Byte]): Option[(Int, Int, Long)] = {
    if (bytes.length < 12) return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) =
      if (off + n > bytes.length) "" else new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "AVI ") return None
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = ascii(off, 4)
      val size = b.getInt(off + 4).toLong & 0xffffffffL
      if (size > Int.MaxValue - 16) return None
      if (id == "LIST" && ascii(off + 8, 4) == "hdrl") {
        // descend: sub-chunks start after the 4-byte list type
        var sub = off + 12
        val listEnd = math.min(off + 8 + size.toInt, bytes.length)
        while (sub + 8 <= listEnd) {
          val sid = ascii(sub, 4)
          val ssize = b.getInt(sub + 4).toLong & 0xffffffffL
          if (sid == "avih" && ssize >= 40 && sub + 8 + 40 <= bytes.length) {
            val usPerFrame = b.getInt(sub + 8).toLong & 0xffffffffL
            val frames = b.getInt(sub + 8 + 16).toLong & 0xffffffffL
            val w = b.getInt(sub + 8 + 32)
            val h = b.getInt(sub + 8 + 36)
            if (w <= 0 || h <= 0 || usPerFrame <= 0L) return None
            return Some((w, h, usPerFrame * frames / 1000L))
          }
          if (ssize > Int.MaxValue - 16) return None
          sub += 8 + ssize.toInt + (ssize.toInt & 1)
          // a lying sub-chunk size can wrap the Int offset negative;
          // re-entering the walk with a negative index would throw —
          // mirror probeWav's totality guard and bail to the stub
          if (sub < 0) return None
        }
        return None
      }
      off += 8 + size.toInt + (size.toInt & 1)
      if (off < 0) return None
    }
    None
  }

  /** Synthesize a REAL ISO BMFF (mp4) header payload: `ftyp(isom)` +
    * `moov( mvhd + trak(tkhd) )` with version-0 boxes — movie
    * timescale 1000 so the mvhd duration IS the millisecond count,
    * and the tkhd width/height in the spec's 16.16 fixed-point
    * encoding. Not a playable movie (no `mdat`/sample tables — the
    * header-only probe target), but byte-for-byte the real
    * big-endian box layout an ISO BMFF walk parses. mp4 is what real
    * corpora mostly ship; this completes the video leg beyond the
    * RIFF/AVI container.
    */
  def synthesizeMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= 0x7fff && height <= 0x7fff &&
      durationMs >= 0 && durationMs <= Int.MaxValue.toLong,
      s"synthetic mp4 params out of range: ${width}x$height, $durationMs ms")
    bmffHeaderPayload("isom", durationMs, width, height)
  }

  /** Synthesize a REAL ISO BMFF AUDIO header payload (m4a): major
    * brand `M4A ` and a single audio trak — tkhd volume 1.0 (8.8
    * fixed point) with the spec-mandated 0×0 track dimensions, the
    * exact shape [[probeBmffAudio]] recovers the duration from and
    * [[probeMp4]] correctly REFUSES (no video track). Byte-for-byte
    * the same big-endian box layout as [[synthesizeMp4]] apart from
    * the brand and the audio tkhd fields.
    */
  def synthesizeM4a(durationMs: Long): Array[Byte] = {
    require(durationMs >= 0 && durationMs <= Int.MaxValue.toLong,
      s"synthetic m4a duration out of range: $durationMs ms")
    bmffHeaderPayload("M4A ", durationMs, 0, 0)
  }

  /** Shared ISO BMFF writer behind [[synthesizeMp4]] /
    * [[synthesizeM4a]]: `ftyp(brand)` + `moov(mvhd + trak(tkhd))`,
    * version-0 boxes, movie timescale 1000 (the mvhd duration IS
    * the millisecond count), tkhd width/height in 16.16 fixed point
    * — `width == 0` means an AUDIO track (volume 1.0, 0×0 dims).
    * Not a playable file (no `mdat`/sample tables — the header-only
    * probe target), but byte-for-byte the real box layout.
    */
  private def bmffHeaderPayload(
      brand: String, durationMs: Long, width: Int, height: Int): Array[Byte] = {
    val ftypSize = 20       // header + major brand + minor version + 1 brand
    val mvhdSize = 8 + 100  // version-0 mvhd payload is exactly 100 bytes
    val tkhdSize = 8 + 84   // version-0 tkhd payload is exactly 84 bytes
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + trakSize
    // ISO BMFF is big-endian — ByteBuffer's default order
    val buf = java.nio.ByteBuffer.allocate(ftypSize + moovSize)
    def fourcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
    def unityMatrix(): Unit = {
      buf.putInt(0x00010000).putInt(0).putInt(0)
      buf.putInt(0).putInt(0x00010000).putInt(0)
      buf.putInt(0).putInt(0).putInt(0x40000000)
      ()
    }
    buf.putInt(ftypSize); fourcc("ftyp")
    fourcc(brand); buf.putInt(0x200); fourcc("isom")
    buf.putInt(moovSize); fourcc("moov")
    buf.putInt(mvhdSize); fourcc("mvhd")
    buf.putInt(0)                       // version 0 + flags
    buf.putInt(0).putInt(0)             // creation, modification
    buf.putInt(1000)                    // timescale: 1 unit = 1 ms
    buf.putInt(durationMs.toInt)        // duration (movie timescale units)
    buf.putInt(0x00010000)              // rate 1.0 (16.16)
    buf.putShort(0x0100.toShort)        // volume 1.0 (8.8)
    buf.putShort(0)                     // reserved
    buf.putInt(0).putInt(0)             // reserved[2]
    unityMatrix()
    var i = 0
    while (i < 6) { buf.putInt(0); i += 1 } // pre_defined[6]
    buf.putInt(2)                       // next_track_ID
    buf.putInt(trakSize); fourcc("trak")
    buf.putInt(tkhdSize); fourcc("tkhd")
    buf.putInt(0x000007)                // v0; enabled | in_movie | in_preview
    buf.putInt(0).putInt(0)             // creation, modification
    buf.putInt(1)                       // track_ID
    buf.putInt(0)                       // reserved
    buf.putInt(durationMs.toInt)        // track duration (movie timescale)
    buf.putInt(0).putInt(0)             // reserved[2]
    buf.putShort(0).putShort(0)         // layer, alternate_group
    // volume: 0 for a video track, 1.0 (8.8 fixed) for audio
    buf.putShort(if (width == 0) 0x0100.toShort else 0).putShort(0)
    unityMatrix()
    buf.putInt(width << 16)             // 16.16 fixed-point width
    buf.putInt(height << 16)            // 16.16 fixed-point height
    buf.array()
  }

  /** Shared ISO BMFF box walk behind [[probeMp4]] (video: dims
    * required) and [[probeBmffAudio]] (audio: duration only):
    * `Some((durationMs, dims))` where `durationMs` comes from
    * `moov/mvhd` (timescale + duration, versions 0 and 1;
    * `duration · 1000 / timescale`, integer floor — exact for the
    * synthesizers' timescale-1000 payloads) and `dims` is the first
    * `trak/tkhd` with nonzero 16.16 dimensions (the video track —
    * audio tkhds carry 0×0, so an m4a yields `dims = None`).
    * Requires a leading `ftyp` box — the standard brand marker — to
    * discriminate from arbitrary bytes. None otherwise; offsets are
    * carried as Long and every read is bounds-checked, so the walk
    * never throws or wraps on arbitrary/lying payloads (the
    * probeWav/probeAvi totality contract).
    */
  private def bmffMovie(
      bytes: Array[Byte]): Option[(Long, Option[(Int, Int)])] = {
    if (bytes.length < 16) return None
    val b = java.nio.ByteBuffer.wrap(bytes) // big-endian default
    val len = bytes.length.toLong
    def ascii(off: Long, n: Int): String =
      if (off < 0 || off + n > len) ""
      else new String(bytes, off.toInt, n, "US-ASCII")
    def u32(off: Long): Long =
      if (off < 0 || off + 4 > len) -1L
      else b.getInt(off.toInt).toLong & 0xffffffffL
    // first box of `tpe` in [from, to): Some((payloadStart, boxEnd));
    // None on not-found or any malformed size
    def findBox(from: Long, to: Long, tpe: String): Option[(Long, Long)] = {
      var off = from
      while (off + 8 <= to) {
        val size0 = u32(off)
        val id = ascii(off + 4, 4)
        if (size0 < 0L || id.isEmpty) return None
        var payload = off + 8
        val end: Long =
          if (size0 == 0L) to // "box extends to end of enclosing scope"
          else if (size0 == 1L) { // 64-bit largesize follows the type
            if (off + 16 > to) return None
            payload = off + 16
            val hi = u32(off + 8); val lo = u32(off + 12)
            if (hi < 0L || lo < 0L) return None
            off + ((hi << 32) | lo)
          } else off + size0
        if (end < payload || end > to) return None
        if (id == tpe) return Some((payload, end))
        off = end
      }
      None
    }
    if (ascii(4, 4) != "ftyp") return None
    val moov = findBox(0L, len, "moov")
    if (moov.isEmpty) return None
    val (moovP, moovE) = moov.get
    // mvhd: movie timescale + duration (v0: 32-bit, v1: 64-bit)
    val mvhd = findBox(moovP, moovE, "mvhd")
    if (mvhd.isEmpty) return None
    val (mv, mvE) = mvhd.get
    val mvVer = if (mv < len) bytes(mv.toInt) & 0xff else -1
    val (ts, dur): (Long, Long) =
      if (mvVer == 0 && mvE - mv >= 20) (u32(mv + 12), u32(mv + 16))
      else if (mvVer == 1 && mvE - mv >= 32) {
        val t = u32(mv + 20)
        val dhi = u32(mv + 24); val dlo = u32(mv + 28)
        if (dhi < 0L || dlo < 0L) (t, -1L) else (t, (dhi << 32) | dlo)
      } else (-1L, -1L)
    if (ts <= 0L || dur < 0L) return None
    val ms = dur * 1000L / ts
    // first trak whose tkhd has nonzero dims = the video track
    var cur = moovP
    var dims: Option[(Int, Int)] = None
    while (cur < moovE && dims.isEmpty) {
      findBox(cur, moovE, "trak") match {
        case Some((tp, te)) =>
          findBox(tp, te, "tkhd") match {
            case Some((tk, tkE)) if tk < len =>
              val v = bytes(tk.toInt) & 0xff
              val need = if (v == 1) 96L else 84L
              val wOff = if (v == 1) tk + 88 else tk + 76
              if (tkE - tk >= need) {
                // integer part of the 16.16 encoding; a fraction-only
                // width (< 1 px) is not a usable video dimension
                val w = (u32(wOff) >> 16).toInt
                val h = (u32(wOff + 4) >> 16).toInt
                if (w > 0 && h > 0) dims = Some((w, h))
              }
            case _ => ()
          }
          cur = te
        case None => cur = moovE
      }
    }
    Some((ms, dims))
  }

  /** Header-only ISO BMFF (mp4/mov) VIDEO probe: (width, height,
    * duration_ms) via [[bmffMovie]]; None when the container has no
    * video track (an m4a's tkhds all carry 0×0 dims) — the kind
    * dispatch routes such payloads to [[probeBmffAudio]] instead.
    */
  def probeMp4(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    bmffMovie(bytes).collect { case (ms, Some((w, h))) => (w, h, ms) }

  /** Header-only ISO BMFF AUDIO probe (m4a/mp4 audio): duration_ms
    * from `moov/mvhd` via [[bmffMovie]], ignoring track dimensions —
    * the audio leg of the BMFF family, completing probeWav the way
    * [[probeMp4]] completes probeAvi. Total on arbitrary bytes
    * (bounds-checked Long offsets, never throws).
    */
  def probeBmffAudio(bytes: Array[Byte]): Option[Long] =
    bmffMovie(bytes).map(_._1)

  /** Header-only image probe: (width, height, format) via the
    * registered `javax.imageio` reader, without decoding pixels —
    * `ImageReader.getWidth/getHeight` read the header only, so a
    * 50 MB JPEG costs a few KB of I/O, not a full raster decode.
    * None when no installed reader recognizes the payload.
    */
  def probeImage(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        // NonFatal, not just IOException: ImageIO readers throw
        // IllegalArgument/IndexOutOfBounds on malformed-but-recognized
        // headers (truncated GIF/BMP), and the decode pipeline must
        // stay total — a corrupt payload falls back to the stub, it
        // does not abort the task
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** ======= DEFAULT CODEC =======
    * Real metadata decode: image payloads via `javax.imageio`
    * (PNG/JPEG/GIF/BMP with the stock JDK; TIFF+ with plugins on the
    * executor classpath), audio payloads via the RIFF/WAVE header
    * walk ([[probeWav]]) then the ISO BMFF mvhd walk
    * ([[probeBmffAudio]], m4a), video payloads via the RIFF/AVI main-
    * header walk ([[probeAvi]]) then the ISO BMFF box walk
    * ([[probeMp4]], mp4/mov — the container real corpora mostly
    * ship) — all pure JVM, no codec dependency; stub fallback for
    * anything unrecognized (an ffmpeg-style binding for genuinely
    * exotic containers drops in as another [[Codec]]).
    */
  def decodeImageIO(batch: Seq[MediaItem]): Seq[MediaFeatures] = {
    val fallback = decodeStub(batch)
    batch.zip(fallback).map {
      case (m, fb) if m.kind == "image" =>
        probeImage(m.payload) match {
          case Some((w, h, fmt)) =>
            fb.copy(width = w, height = h, duration_ms = 0L, format = fmt)
          case None => fb
        }
      case (m, fb) if m.kind == "audio" =>
        probeWav(m.payload) match {
          case Some(ms) =>
            fb.copy(width = 0, height = 0, duration_ms = ms, format = "wav")
          case None => probeBmffAudio(m.payload) match {
            case Some(ms) =>
              fb.copy(width = 0, height = 0, duration_ms = ms, format = "m4a")
            case None => fb
          }
        }
      case (m, fb) if m.kind == "video" =>
        probeAvi(m.payload) match {
          case Some((w, h, ms)) =>
            fb.copy(width = w, height = h, duration_ms = ms, format = "avi")
          case None => probeMp4(m.payload) match {
            case Some((w, h, ms)) =>
              fb.copy(width = w, height = h, duration_ms = ms, format = "mp4")
            case None => fb
          }
        }
      case (_, fb) => fb
    }
  }

  /** Distributed decode: repartition for parallel codec work, then
    * batched mapPartitions through the codec. `batchSize` bounds
    * per-batch memory (payloads can be MBs each at 100 TB scale —
    * never collect a partition into one batch).
    */
  def decodeFeatures(
      spark: SparkSession, media: DataFrame,
      partitions: Int, batchSize: Int = 64,
      codec: Codec = decodeImageIO): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaItem]
      .repartition(partitions, col("media_id"))
      .mapPartitions(_.grouped(batchSize).flatMap(g => codec(g.toSeq)))
  }

  /** Per-(kind, source) media-token census over a media table
    * (media_id, kind, payload, source): decode through `codec` (real
    * header probes with stub fallback), price each row in its
    * modality's token unit — [[patchTokens]] for images,
    * [[audioTokens]] for audio, [[videoTokens]] for video — and
    * aggregate ONE group-sized census: (kind, source, n_items,
    * n_real_decode, total_ms, total_media_tokens). Every census
    * column is a mergeable integer (counts and sums), so per-batch
    * partials fold BY ADDITION into exactly the single-pass census —
    * the contract [[mediaCensusFromPartials]] and the streaming sink
    * ([[graft.streaming.StreamingCuration.mediaCensusSink]]) rely on.
    * The dims→source join projects only (media_id, source) off the
    * media frame (payloads pruned), and decode stays the
    * embarrassingly-parallel map-side work of [[decodeFeatures]].
    */
  def mediaTokenCensus(
      spark: SparkSession, media: DataFrame, partitions: Int,
      patchSize: Int = DefaultPatchSize, videoFrames: Int = 8,
      audioTokensPerSecond: Int = DefaultAudioTokensPerSecond,
      codec: Codec = decodeImageIO, batchSize: Int = 64): DataFrame = {
    val dims = decodeFeatures(spark, media, partitions, batchSize, codec)
      .toDF()
    dims
      .join(media.select(col("media_id"), col("source")), Seq("media_id"))
      .groupBy(col("kind"), col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("format") =!= "synthetic", 1L).otherwise(0L))
          .as("n_real_decode"),
        sum(col("duration_ms")).as("total_ms"),
        sum(when(col("kind") === "image",
            patchTokens(col("width"), col("height"), patchSize))
          .when(col("kind") === "audio",
            audioTokens(col("duration_ms"), audioTokensPerSecond))
          .otherwise(
            videoTokens(col("width"), col("height"), videoFrames, patchSize)))
          .as("total_media_tokens"))
  }

  /** Fold any accumulation of [[mediaTokenCensus]] partials (e.g. the
    * per-batch append log a streaming sink writes) into the census of
    * everything they cover — integer addition per (kind, source),
    * exactly equal to the single-pass census over the union of the
    * batches (all columns are counts/sums; spec-pinned streamed ==
    * batch on a two-batch split).
    */
  def mediaCensusFromPartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("kind"), col("source"))
      .agg(
        sum(col("n_items")).as("n_items"),
        sum(col("n_real_decode")).as("n_real_decode"),
        sum(col("total_ms")).as("total_ms"),
        sum(col("total_media_tokens")).as("total_media_tokens"))

  /** ViT-style patch-token count from image dimensions: an image of
    * (width × height) pixels costs `ceil(w/P)·ceil(h/P) + 1` tokens
    * in a P-pixel-patch vision encoder (the +1 is the class token) —
    * the unit a multimodal training budget charges images in, the
    * way BPE tokens charge text. Pure codegen column arithmetic over
    * dimension columns, so it composes with EITHER dimension source:
    * the real `decodeFeatures` width/height (header-probed) or any
    * synthetic stand-in. The ceil is exact: (d + P−1)/P on
    * non-negative ints is correctly rounded in double and floor'd,
    * identical to integer `//` in any engine.
    */
  def patchTokens(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column,
      patchSize: Int = DefaultPatchSize):
      org.apache.spark.sql.Column = {
    require(patchSize >= 1, s"patchSize must be positive, got $patchSize")
    val p = lit(patchSize.toDouble)
    val wp = floor((width.cast("long") + lit(patchSize - 1).cast("long"))
      .cast("double") / p).cast("long")
    val hp = floor((height.cast("long") + lit(patchSize - 1).cast("long"))
      .cast("double") / p).cast("long")
    // negative dimensions (a corrupt header probe) NULL out instead of
    // producing positive-looking nonsense ((-12)·(-12)+1) that would
    // silently skew a mixture budget — the budget aggregates exclude
    // NULL token rows, so the bad row surfaces as a dropped count
    when(width.cast("long") >= 0L && height.cast("long") >= 0L,
      wp * hp + lit(1L))
  }

  /** Speech-encoder token count from audio duration: `ceil(ms·R/1000)`
    * tokens at `tokensPerSecond = R` (e.g. 50 for a 20 ms-frame
    * acoustic encoder, 25 for a downsampled one). Exact integer
    * arithmetic stated as a floor'd double division — and the floor is
    * exact for EVERY numerator `n = ms·R + 999 ≤ 2⁵³`, not only when
    * 1000 divides it: such `n` converts to double losslessly, and the
    * correctly-rounded quotient `n/1000.0` can only cross the next
    * integer if the true fractional shortfall `(1000−r)/1000 ≥ 1/1000`
    * were smaller than half an ulp of the quotient — but the quotient
    * is ≤ 2⁵³/1000 ≈ 2⁴³, whose ulp is 2⁻⁹ < 2/1000 only at the very
    * top, and even there half an ulp (2⁻¹⁰ ≈ 0.00098) stays below the
    * minimum shortfall 1/1000 = 0.001. So rounding never reaches the
    * next integer and `floor` returns the true `ceil(ms·R/1000)`.
    * 2⁵³/R ms is ~5,700 years of audio at R=50 — far beyond any guard
    * (query-side stand-ins cap at 60 s), so the idiom is exact over
    * the entire admissible domain, same conclusion as [[patchTokens]].
    */
  def audioTokens(durationMs: org.apache.spark.sql.Column,
      tokensPerSecond: Int = DefaultAudioTokensPerSecond)
      : org.apache.spark.sql.Column = {
    require(tokensPerSecond >= 1,
      s"tokensPerSecond must be positive, got $tokensPerSecond")
    // negative duration NULLs out (see patchTokens' guard note)
    when(durationMs.cast("long") >= 0L,
      floor((durationMs.cast("long") * lit(tokensPerSecond.toLong) + lit(999L))
        .cast("double") / lit(1000.0)).cast("long"))
  }

  /** Video token count: `nFrames` sampled frames, each costing the
    * image [[patchTokens]] of the frame dimensions — the uniform-
    * frame-sampling cost model ([[sampleFrames]] is the row-level
    * form; this is the budget arithmetic).
    */
  def videoTokens(width: org.apache.spark.sql.Column,
      height: org.apache.spark.sql.Column, nFrames: Int = 8,
      patchSize: Int = DefaultPatchSize): org.apache.spark.sql.Column = {
    require(nFrames >= 1, s"nFrames must be positive, got $nFrames")
    lit(nFrames.toLong) * patchTokens(width, height, patchSize)
  }

  /** Frame sampling for video rows: explode n evenly-spaced fake
    * frame indices per video (the Spark-side shape of ffmpeg frame
    * extraction — one row out per sampled frame).
    */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .select(col("media_id"), col("frame_idx"),
        xxhash64(col("payload"), col("frame_idx")).as("frame_fingerprint"))
}
