package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Uint256

/** Engine extension point (`spark.sql.extensions=graft.GraftExtensions`):
  * registers the custom Catalyst expressions in the session's
  * FunctionRegistry so they are first-class SQL functions —
  * `SELECT uint256_add(value, cost) FROM transactions` — and reachable
  * from the Column API via `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[Uint256.Uint256Add].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("uint256_add"),
      info("uint256_add", "uint256_add(a, b) - exact sum of two decimal-string uint256s"),
      (args: Seq[Expression]) => Uint256.Uint256Add(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("uint256_mul"),
      info("uint256_mul", "uint256_mul(a, b) - exact product of two decimal-string uint256s"),
      (args: Seq[Expression]) => Uint256.Uint256Mul(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("uint256_cmp"),
      info("uint256_cmp", "uint256_cmp(a, b) - numeric three-way compare of decimal strings"),
      (args: Seq[Expression]) => Uint256.Uint256Cmp(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("keccak256"),
      info("keccak256", "keccak256(bytes) - Ethereum's Keccak-256 digest (pre-NIST padding)"),
      (args: Seq[Expression]) => graft.functions.Keccak.Keccak256(args(0))))
    ext.injectFunction((
      FunctionIdentifier("image_meta"),
      info("image_meta", "image_meta(bytes) - struct(format, width, height) of a PNG/JPEG/GIF header, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.ImageHeader.ImageMetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("av_meta"),
      info("av_meta", "av_meta(bytes) - struct(container, sample_rate, channels, duration_s, width, height, fps) of a WAV/MP4 header, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AvHeader.AvMetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("wav_pcm"),
      info("wav_pcm", "wav_pcm(bytes) - struct(sample_rate, channels, n_samples, min_s, max_s, sum_s, sum_sq, codec) decoded from WAV samples (PCM16 / G.711 ulaw / alaw / IMA ADPCM), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AvHeader.WavPcmExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("wav_resample"),
      info("wav_resample", "wav_resample(bytes, rate) - zero-order-hold resample of a decoded WAV (PCM16/G.711/ADPCM) to the target rate, re-encoded as canonical PCM16 WAV, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AvHeader.WavResampleExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("mp3_meta"),
      info("mp3_meta", "mp3_meta(bytes) - struct(version, layer, sample_rate, channels, bitrate_kbps, frames, total_bytes, duration_ms, avg_kbps, xing_frames, vbr) from an MPEG-audio frame-header walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Mp3Header.Mp3MetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3_frames"),
      info("mp3_frames", "mp3_frames(bytes) - array of per-frame structs (frame_idx, offset, frame_len, padding, kbps, rate) from an MPEG-audio frame walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Mp3Header.Mp3FramesExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen"),
      info("mp3l3_gen", "mp3l3_gen(seed) - deterministic single-frame MPEG-1 Layer III stream (side info + scalefactors + Huffman-coded spectral lines) for seed"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen_esc"),
      info("mp3l3_gen_esc", "mp3l3_gen_esc(seed) - escape-edition Layer III stream: table selects over the full ISO Table B.7 set including the sixteen linbits escape tables 16-31"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenEscExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen_short"),
      info("mp3l3_gen_short", "mp3l3_gen_short(seed) - window-switching Layer III stream: granule block types cycle short/start/short/stop with 12x3 short scalefactor triplets and subblock gains"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenShortExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen_mixed"),
      info("mp3l3_gen_mixed", "mp3l3_gen_mixed(seed) - mixed-block Layer III stream: block_type 2 granules alternating mixed_block_flag, long scalefactor bands 0-7 + short bands 3-11 on the mixed granule"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenMixedExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_spectral"),
      info("mp3l3_spectral", "mp3l3_spectral(bytes) - struct of side-info fields + integer-exact spectral-line functionals from a Layer III entropy decode (full Table B.7 incl. linbits escapes, count1 A/B), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3SpectralExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen_stereo"),
      info("mp3l3_gen_stereo", "mp3l3_gen_stereo(seed) - two-channel Layer III stream: four granule payloads, plain stereo on even seeds, joint stereo with the MS extension on odd"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenStereoExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_gen_stereo_int"),
      info("mp3l3_gen_stereo_int", "mp3l3_gen_stereo_int(seed) - joint-stereo Layer III stream with the intensity extension (intensity-only on even seeds, intensity+MS on odd)"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3GenStereoIntExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("mp3l3_spectral_st"),
      info("mp3l3_spectral_st", "mp3l3_spectral_st(bytes) - header mode fields + per-slot integer-exact spectral functionals of a stereo Layer III stream, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Mp3L3.Mp3L3SpectralStExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("adts_meta"),
      info("adts_meta", "adts_meta(bytes) - struct(mpeg_version, object_type, sample_rate, channels, crc_present, frames, total_bytes, duration_ms, avg_kbps) from an AAC ADTS frame-header walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AdtsHeader.AdtsMetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("adts_frames"),
      info("adts_frames", "adts_frames(bytes) - array of per-frame structs (frame_idx, offset, frame_len, crc_present, payload_len) from an AAC ADTS frame walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AdtsHeader.AdtsFramesExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("h264_gen"),
      info("h264_gen", "h264_gen(seed) - deterministic Annex-B H.264 stream (exp-Golomb SPS, escaped slice payloads) for seed"),
      (args: Seq[Expression]) => graft.pipeline.H264Nal.H264GenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("h264_meta"),
      info("h264_meta", "h264_meta(bytes) - struct(nal counts, slice_rbsp_bytes, SPS profile/level/dims/crop) from an Annex-B NAL walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.H264Nal.H264MetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("flac_meta"),
      info("flac_meta", "flac_meta(bytes) - struct(block/frame bounds, sample_rate, channels, bits_per_sample, total_samples, duration_ms, n_blocks, md5_hex) from a FLAC STREAMINFO + metadata-block walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.FlacHeader.FlacMetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("flac_gen_audio"),
      info("flac_gen_audio", "flac_gen_audio(seed) - deterministic single-frame FLAC file (Rice-coded constant/verbatim/fixed/LPC subframes, all stereo decorrelation modes, CRC-8/CRC-16) for seed"),
      (args: Seq[Expression]) => graft.pipeline.FlacPcm.FlacGenAudioExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("flac_pcm"),
      info("flac_pcm", "flac_pcm(bytes) - struct of frame-header fields + integer-exact per-channel PCM sample functionals from a full FLAC frame decode, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.FlacPcm.FlacPcmExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("vp9_gen"),
      info("vp9_gen", "vp9_gen(seed) - deterministic VP9-in-IVF capture file (keyframe + inter frames) for seed"),
      (args: Seq[Expression]) => graft.pipeline.Vp9Ivf.Vp9GenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("vp9_meta"),
      info("vp9_meta", "vp9_meta(bytes) - struct(IVF header fields, frame-type counts, first-keyframe VP9 header: profile/bit depth/color/dims) from an IVF walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Vp9Ivf.Vp9MetaExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("vp9_frames"),
      info("vp9_frames", "vp9_frames(bytes) - array of per-frame structs (frame_idx, offset, frame_len, pts, is_key) from an IVF frame walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.Vp9Ivf.Vp9FramesExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("png_gen"),
      info("png_gen", "png_gen(seed) - deterministic DEFLATE-compressed grayscale PNG for seed (closed-form pixel pattern)"),
      (args: Seq[Expression]) => graft.pipeline.PngCodec.PngGenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("image_pixels"),
      info("image_pixels", "image_pixels(bytes) - struct(width, height, n_px, min_px, max_px, sum_px, sum_sq) of a decoded compressed image (PNG/JPEG/GIF/BMP), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.PngCodec.ImagePixelsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("image_resize"),
      info("image_resize", "image_resize(bytes, w, h, mode) - resample a decoded image to w x h by 'nearest' or 'box' (area average) and re-encode as grayscale PNG, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.PngCodec.ImageResizeExpr(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("gif_gen"),
      info("gif_gen", "gif_gen(seed) - deterministic LZW-compressed grayscale GIF89a for seed (closed-form pixel pattern)"),
      (args: Seq[Expression]) => graft.pipeline.GifCodec.GifGenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gif_pixels"),
      info("gif_pixels", "gif_pixels(bytes) - struct(width, height, n_px, min_px, max_px, sum_px, sum_sq) via the hand-written GIF LZW decoder, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.GifCodec.GifPixelsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("ecrecover"),
      info("ecrecover", "ecrecover(sigHash, r, s, recId) - uncompressed secp256k1 pubkey, NULL if invalid"),
      (args: Seq[Expression]) => graft.functions.TxSender.EcRecover(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold double dot product of two float arrays"),
      (args: Seq[Expression]) => graft.pipeline.Similarity.VecDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_int"),
      info("vec_dot_int", "vec_dot_int(a, b) - exact integer dot product of two bigint code arrays"),
      (args: Seq[Expression]) => graft.pipeline.Quantize.VecDotInt(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("pack_int8"),
      info("pack_int8", "pack_int8(codes) - pack bigint int8 codes into one signed byte each"),
      (args: Seq[Expression]) => graft.pipeline.Quantize.PackInt8(args(0))))
    ext.injectFunction((
      FunctionIdentifier("vec_dot_int8"),
      info("vec_dot_int8", "vec_dot_int8(a, b) - exact integer dot product of two packed-byte code columns"),
      (args: Seq[Expression]) => graft.pipeline.Quantize.VecDotInt8(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      info("pq_adc", "pq_adc(codes, lut, kk) - ADC sum over packed PQ codes against a per-query lookup table"),
      (args: Seq[Expression]) => graft.pipeline.Pq.PqAdc(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("audio_to_wav"),
      info("audio_to_wav", "audio_to_wav(bytes) - normalize any supported audio container (WAV/G.711/ADPCM, FLAC, ADTS AAC-LC, MPEG-1 Layer III) to canonical PCM16 WAV at the source rate, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AudioNorm.AudioToWavExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("image_dhash"),
      info("image_dhash", "image_dhash(bytes) - 64-bit perceptual difference hash (9x8 box grid, bit set iff left < right neighbor), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.PerceptualHash.ImageDHashExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("image_ahash"),
      info("image_ahash", "image_ahash(bytes) - 64-bit perceptual average hash (8x8 box grid, bit set iff cell > integer mean), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.PerceptualHash.ImageAHashExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("audio_fingerprint"),
      info("audio_fingerprint", "audio_fingerprint(bytes) - 64-bit perceptual band-energy fingerprint (33 time cells x {amplitude, first-difference} comparison bits) of any supported audio container, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AudioFingerprint.AudioFingerprintExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gif_anim_gen"),
      info("gif_anim_gen", "gif_anim_gen(seed, delay_scale, bump) - deterministic multi-frame animated GIF89a (GCE delays, sub-rect compositing) for seed; delay_scale builds the temporal-scale twin, bump the localized-edit twin"),
      (args: Seq[Expression]) => graft.pipeline.GifAnim.GifAnimGenExpr(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("gif_frames"),
      info("gif_frames", "gif_frames(bytes) - array of per-frame structs (frame_idx, delay_cs, f_left, f_top, f_w, f_h, composited-canvas sum_px) from the animated-GIF walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.GifAnim.GifFramesExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gif_upscale"),
      info("gif_upscale", "gif_upscale(bytes, k) - pixel-replication x k transcode of an animated GIF (composited canvases re-encoded as full frames, delays preserved), else NULL"),
      (args: Seq[Expression]) => graft.pipeline.GifAnim.GifUpscaleExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("video_fingerprint"),
      info("video_fingerprint", "video_fingerprint(bytes) - 64-bit perceptual video fingerprint (32 temporal time-cell comparison bits + 32 spatial box comparison bits over the time-weighted canvas) of an animated GIF, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.VideoFingerprint.VideoFingerprintExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("struct_av_gen"),
      info("struct_av_gen", "struct_av_gen(seed, ktime, ksize, bump) - deterministic codec-blind IVF capture for seed (closed-form frame lengths + PTS timeline); ktime re-times, ksize scales sizes, bump edits the last frame's length"),
      (args: Seq[Expression]) => graft.pipeline.StructFingerprint.StructAvGenExpr(args(0), args(1), args(2), args(3))))
    ext.injectFunction((
      FunctionIdentifier("ivf_to_mp4"),
      info("ivf_to_mp4", "ivf_to_mp4(bytes) - real IVF -> ISO-BMFF MP4 re-mux: the walked (len, dur) sequence re-emitted as stts/stsz sample tables with the frame payloads as mdat, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.StructFingerprint.IvfToMp4Expr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("av_struct_frames"),
      info("av_struct_frames", "av_struct_frames(bytes) - array of (frame_idx, frame_len, dur_ticks) structs from the codec-blind IVF/MP4/ADTS container walk, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.StructFingerprint.AvStructFramesExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("av_struct_fingerprint"),
      info("av_struct_fingerprint", "av_struct_fingerprint(bytes) - 64-bit structural video/AV fingerprint (32 temporal time-cell comparison bits + 32 stream-order index-cell comparison bits over the per-frame byte-size + duration sequence) of an IVF/MP4/ADTS container, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.StructFingerprint.AvStructFingerprintExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("aac_gen"),
      info("aac_gen", "aac_gen(seed) - deterministic two-frame ADTS AAC-LC stream (SCE, long-family window sequences, all eleven spectral codebooks incl. the escape) for seed"),
      (args: Seq[Expression]) => graft.pipeline.AacLc.AacGenExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("aac_gen_pulse"),
      info("aac_gen_pulse", "aac_gen_pulse(seed) - the aac_gen stream with pulse data on every frame (1-4 pulses, seed-derived start band, cumulative offsets, amplitudes)"),
      (args: Seq[Expression]) => graft.pipeline.AacLc.AacGenPulseExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("aac_gen_tns"),
      info("aac_gen_tns", "aac_gen_tns(seed) - the aac_gen stream with temporal-noise-shaping data on every frame (filters, orders, directions, compress modes, coefficient indices all seed-derived)"),
      (args: Seq[Expression]) => graft.pipeline.AacLc.AacGenTnsExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("aac_gen_short"),
      info("aac_gen_short", "aac_gen_short(seed) - deterministic two-frame EIGHT_SHORT ADTS AAC-LC stream (seed-derived scale_factor_grouping, per-group sectioning, interleaved spectra) for seed"),
      (args: Seq[Expression]) => graft.pipeline.AacLc.AacGenShortExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("aac_spectral"),
      info("aac_spectral", "aac_spectral(bytes) - struct of per-frame side info + integer-exact entropy functionals (section/scalefactor weighted sums, exact part-length bit count, spectral value/position sums) of an AAC-LC ADTS stream, else NULL"),
      (args: Seq[Expression]) => graft.pipeline.AacLc.AacSpectralExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gzip_text"),
      info("gzip_text", "gzip_text(s) - deterministic gzip (RFC 1952, MTIME 0) of the UTF-8 text"),
      (args: Seq[Expression]) => graft.pipeline.TextCodec.GzipTextExpr(args(0))))
    ext.injectFunction((
      FunctionIdentifier("gunzip_text"),
      info("gunzip_text", "gunzip_text(bytes) - text from one-or-many concatenated gzip members, NULL on corruption"),
      (args: Seq[Expression]) => graft.pipeline.TextCodec.GunzipTextExpr(args(0))))
  }
}
