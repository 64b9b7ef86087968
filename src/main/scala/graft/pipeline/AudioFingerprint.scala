package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** AUDIO PERCEPTUAL FINGERPRINTING — the dedup modality for audio
  * columns, completing the family next to text SimHash and image dHash
  * ([[PerceptualHash]]): byte identity catches exact copies; this
  * 64-bit fingerprint catches re-encoded / resampled twins, the
  * dominant audio-duplication mode in a scraped corpus (the same
  * recording at 22.05 and 44.1 kHz, WAV vs FLAC vs MP3 re-save).
  *
  * `audio_fingerprint(bytes)`:
  *   1. normalize ANY supported container through [[AudioNorm.toWav]]
  *      (WAV PCM16 / G.711 / ADPCM, FLAC, ADTS AAC-LC, MPEG-1 Layer
  *      III) — so the same PCM re-encoded through a different codec
  *      fingerprints identically wherever the decode is sample-exact;
  *   2. fold channels by SUM into one Long per frame (sum, not mean:
  *      no division, and a mono→stereo duplication scales every frame
  *      by the same factor, which step 4's comparisons ignore);
  *   3. cut the stream into 33 TIME CELLS by the same floor-division
  *      box arithmetic as [[PerceptualHash.boxGrid]] — cell t covers
  *      frames [⌊t·n/33⌋, max(⌊t·n/33⌋+1, ⌊(t+1)·n/33⌋)) — and per
  *      cell take two integer BAND ENERGIES: `low(t) = Σ |mono[i]|`
  *      (amplitude envelope) and `diff(t) = Σ_{i≥1} |mono[i]−mono[i−1]|`
  *      (first-difference energy, the high-frequency proxy — for an
  *      alternating-sign pattern of magnitudes a,b the low band tracks
  *      a+b while the diff band tracks max(a,b), so the two bands carry
  *      independent information);
  *   4. emit the dHash-style comparison bits: bit t (t < 32) set iff
  *      low(t) < low(t+1), bit 32+t set iff diff(t) < diff(t+1).
  *
  * Comparison bits — not the energies themselves — are what make the
  * fingerprint perceptual: they are invariant under uniform amplitude
  * scaling and under k-fold zero-order-hold resampling. The second
  * invariance is EXACT when 33 | n: `wav_resample` to k·rate repeats
  * each source frame k times, so with aligned cell boundaries
  * (⌊t·kn/33⌋ = k·⌊t·n/33⌋) every low(t) scales by exactly k and every
  * diff(t) is exactly preserved (repeats contribute zero difference;
  * each original transition is counted once, in the same cell) — the
  * resampled twin's fingerprint is bit-identical. Localized edits
  * perturb only the cells they touch: a swap of two adjacent frames
  * inside one cell leaves every low(t) unchanged (the amplitude
  * multiset per cell is preserved) and can flip at most the two diff
  * comparisons naming that cell — hamming ≤ 2, inside the ≤ 3 near-dup
  * threshold.
  *
  * Everything is integer arithmetic on Longs (|mono| ≤ 32768·channels,
  * cell sums ≪ 2^63), so an external engine replays the whole chain —
  * PCM closed forms → ZOH mapping → cell bounds → band sums → bits —
  * in SQL, exactly as the image-hash oracles replay [[PerceptualHash]].
  *
  * NULL on undecodable bytes — never a task kill. Near-dup pairing,
  * cluster resolution, and hamming top-k search reuse the text-SimHash
  * machinery unchanged ([[Dedup.simHashNearDupPairsFromFingerprints]],
  * 4×16-bit banded blocking, pigeonhole-exact at hamming ≤ 3;
  * [[Components.nearDupClusters]]), with fingerprints persisted through
  * the [[DedupIndex]] segmented-artifact lifecycle — no all-pairs
  * anywhere, so the 100 TB path is the one already audited for text
  * and images.
  *
  * Scale: one codegen'd expression per row; bytes never leave the
  * task; the decode is AudioNorm's existing per-row work plus two
  * O(n) integer folds.
  */
object AudioFingerprint {

  /** Number of time cells; 33 cells → 32 comparisons per band. */
  val Cells = 33

  /** 64-bit band-energy comparison fingerprint of any supported audio
    * container; null when the bytes don't decode. */
  def fingerprint(bytes: Array[Byte]): java.lang.Long = {
    // Direct decode — same canonical PCM16 AudioNorm.toWav emits, minus
    // the WAV byte re-encode + re-decode a round-trip through toWav
    // would pay (two full PCM copies per row on the ingest hot path).
    val ws = AudioNorm.decodeSamples(bytes)
    if (ws == null) return null
    val ch = ws.channels
    if (ch <= 0) return null
    val n = ws.samples.length / ch
    if (n < 1) return null
    val mono = new Array[Long](n)
    var i = 0
    while (i < n) {
      var s = 0L
      var c = 0
      while (c < ch) { s += ws.samples(i * ch + c); c += 1 }
      mono(i) = s
      i += 1
    }
    java.lang.Long.valueOf(fingerprintOfMono(mono))
  }

  /** The fingerprint of an already-folded mono stream (exposed for the
    * spec's closed-form cross-checks). */
  private[graft] def fingerprintOfMono(mono: Array[Long]): Long = {
    val n = mono.length
    val low = new Array[Long](Cells)
    val diff = new Array[Long](Cells)
    var t = 0
    while (t < Cells) {
      val t0 = (t.toLong * n / Cells).toInt
      val t1 = math.max(t0 + 1, ((t + 1).toLong * n / Cells).toInt)
      var lv = 0L
      var dv = 0L
      var i = t0
      while (i < t1) {
        lv += math.abs(mono(i))
        if (i >= 1) dv += math.abs(mono(i) - mono(i - 1))
        i += 1
      }
      low(t) = lv
      diff(t) = dv
      t += 1
    }
    var hash = 0L
    t = 0
    while (t < Cells - 1) {
      if (low(t) < low(t + 1)) hash |= 1L << t
      if (diff(t) < diff(t + 1)) hash |= 1L << (32 + t)
      t += 1
    }
    hash
  }

  /** `audio_fingerprint(bytes)`: 64-bit perceptual band-energy
    * fingerprint of any supported audio container, else NULL. */
  case class AudioFingerprintExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"audio_fingerprint requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any = {
      val h = AudioFingerprint.fingerprint(input.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val boxed = ctx.freshName("afp")
        s"""
           |java.lang.Long $boxed = graft.pipeline.AudioFingerprint.fingerprint($c);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.longValue(); }
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "audio_fingerprint"
  }
}
