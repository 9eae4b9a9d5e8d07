// Video+audio muxer: write RGB frames + mono PCM into one container.
//
// Backs scripts/generate_audio_swap_fakes.py (the reference remuxes with an
// ffmpeg subprocess, /root/reference/scripts/generate_audio_swap_fakes.py:
// 48-92) and the framework's synthetic A/V test fixtures. Uses the
// built-in mpeg4 encoder + pcm_s16le, so an .avi target needs no external
// codec libraries.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

extern "C" {

// Write a video with an explicit video codec + options.
//
// frames: n_frames * height * width * 3 RGB24 bytes.
// pcm: n_samples mono float32 (pass 0 samples for video-only).
// vcodec_name: avcodec encoder name ("mpeg4", "libx264", ...).
// vcodec_opts: "k=v:k=v" AVDictionary string applied to the encoder
//   (e.g. "crf=28:preset=veryfast" for libx264), or NULL/empty.
// Returns 0 on success, negative on error.
//
// The codec surface backs the H.264 round-trip robustness axis
// (scripts/eval_robustness_grid.py --axis codec): the reference's corpora
// are all H.264-normalized uploads (/root/reference/scripts/
// convert_videos.py:30-44), so compression artifacts are part of the
// production input distribution.
int mux_write_video_ex(const char* path, const uint8_t* frames,
                       int64_t n_frames, int32_t width, int32_t height,
                       double fps, const float* pcm, int64_t n_samples,
                       int32_t sample_rate, const char* vcodec_name,
                       const char* vcodec_opts) {
  av_log_set_level(AV_LOG_ERROR);  // x264 info banners flood eval loops
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
      !fmt)
    return -1;

  int err = -2;
  AVStream* vstream = nullptr;
  AVStream* astream = nullptr;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* vframe = nullptr;
  AVFrame* aframe = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVDictionary* vopts = nullptr;

  do {
    // ── Video stream ──
    const AVCodec* vcodec =
        vcodec_name && vcodec_name[0]
            ? avcodec_find_encoder_by_name(vcodec_name)
            : avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!vcodec) break;
    vstream = avformat_new_stream(fmt, nullptr);
    vctx = avcodec_alloc_context3(vcodec);
    vctx->width = width;
    vctx->height = height;
    vctx->pix_fmt = AV_PIX_FMT_YUV420P;
    vctx->time_base = av_d2q(1.0 / fps, 100000);
    vctx->framerate = av_d2q(fps, 100000);
    // Rate control: x264-style encoders use CRF from vcodec_opts; the
    // built-in mpeg4 encoder needs an explicit bitrate target.
    if (vcodec->id == AV_CODEC_ID_MPEG4)
      vctx->bit_rate = (int64_t)width * height * 8;
    vctx->gop_size = 12;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (vcodec_opts && vcodec_opts[0] &&
        av_dict_parse_string(&vopts, vcodec_opts, "=", ":", 0) < 0)
      break;
    if (avcodec_open2(vctx, vcodec, &vopts) < 0) break;
    avcodec_parameters_from_context(vstream->codecpar, vctx);
    vstream->time_base = vctx->time_base;

    // ── Audio stream: pcm_s16le ──
    bool with_audio = pcm != nullptr && n_samples > 0;
    if (with_audio) {
      const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
      if (!acodec) break;
      astream = avformat_new_stream(fmt, nullptr);
      actx = avcodec_alloc_context3(acodec);
      actx->sample_rate = sample_rate;
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      av_channel_layout_copy(&actx->ch_layout, &mono);
      actx->sample_fmt = AV_SAMPLE_FMT_S16;
      actx->time_base = AVRational{1, sample_rate};
      if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
      if (avcodec_open2(actx, acodec, nullptr) < 0) break;
      avcodec_parameters_from_context(astream->codecpar, actx);
      astream->time_base = actx->time_base;
    }

    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
      if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) break;
    }
    if (avformat_write_header(fmt, nullptr) < 0) break;

    // ── Encode frames ──
    sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                         AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                         nullptr);
    vframe = av_frame_alloc();
    vframe->format = AV_PIX_FMT_YUV420P;
    vframe->width = width;
    vframe->height = height;
    av_frame_get_buffer(vframe, 0);

    auto write_packets = [&](AVCodecContext* ctx, AVStream* stream) -> int {
      int ret;
      while ((ret = avcodec_receive_packet(ctx, pkt)) >= 0) {
        av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
        pkt->stream_index = stream->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) return -1;
      }
      return ret == AVERROR(EAGAIN) || ret == AVERROR_EOF ? 0 : -1;
    };

    bool ok = true;
    for (int64_t i = 0; i < n_frames && ok; ++i) {
      av_frame_make_writable(vframe);
      const uint8_t* src[1] = {frames + i * (size_t)width * height * 3};
      int src_stride[1] = {width * 3};
      sws_scale(sws, src, src_stride, 0, height, vframe->data,
                vframe->linesize);
      vframe->pts = i;
      ok = avcodec_send_frame(vctx, vframe) >= 0 &&
           write_packets(vctx, vstream) >= 0;
    }
    if (!ok) break;
    avcodec_send_frame(vctx, nullptr);
    if (write_packets(vctx, vstream) < 0) break;

    // ── Encode audio ──
    if (with_audio) {
      const int chunk = 4096;
      aframe = av_frame_alloc();
      aframe->format = AV_SAMPLE_FMT_S16;
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      av_channel_layout_copy(&aframe->ch_layout, &mono);
      aframe->sample_rate = sample_rate;
      aframe->nb_samples = chunk;
      av_frame_get_buffer(aframe, 0);
      int64_t pos = 0;
      while (pos < n_samples && ok) {
        int n = (int)std::min<int64_t>(chunk, n_samples - pos);
        av_frame_make_writable(aframe);
        aframe->nb_samples = n;
        int16_t* dst = (int16_t*)aframe->data[0];
        for (int k = 0; k < n; ++k) {
          float v = pcm[pos + k];
          v = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
          dst[k] = (int16_t)(v * 32767.0f);
        }
        aframe->pts = pos;
        pos += n;
        ok = avcodec_send_frame(actx, aframe) >= 0 &&
             write_packets(actx, astream) >= 0;
      }
      if (!ok) break;
      avcodec_send_frame(actx, nullptr);
      if (write_packets(actx, astream) < 0) break;
    }

    if (av_write_trailer(fmt) < 0) break;
    err = 0;
  } while (false);

  if (sws) sws_freeContext(sws);
  av_frame_free(&vframe);
  av_frame_free(&aframe);
  av_packet_free(&pkt);
  av_dict_free(&vopts);
  avcodec_free_context(&vctx);
  avcodec_free_context(&actx);
  if (fmt && !(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
    avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return err;
}

// Legacy entry point: built-in mpeg4 + pcm_s16le (no external codec libs).
int mux_write_video(const char* path, const uint8_t* frames,
                    int64_t n_frames, int32_t width, int32_t height,
                    double fps, const float* pcm, int64_t n_samples,
                    int32_t sample_rate) {
  return mux_write_video_ex(path, frames, n_frames, width, height, fps, pcm,
                            n_samples, sample_rate, "mpeg4", nullptr);
}

}  // extern "C"
