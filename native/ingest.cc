// lipsync_tpu host ingest library: FFmpeg-based video/audio decode.
//
// TPU-native replacement for the reference's PyAV/ffmpeg-subprocess host
// path (/root/reference/app/preprocessing/video.py:19-85 PTS-accurate
// fps resampling; /root/reference/app/preprocessing/audio.py:19-29 audio
// extraction). Exposes a minimal C ABI consumed from Python via ctypes
// (lipsync_tpu/preprocessing/ingest.py). Decoded RGB frames / mono PCM are
// written straight into caller-provided (numpy) buffers, ready for device
// upload — no subprocess, no temp WAV files.
//
// Build: see native/Makefile (links avformat/avcodec/avutil/swscale/
// swresample; ffmpeg 5.x API).

#include <cstdint>
#include <cstring>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

extern "C" {

struct IngestInfo {
  int32_t width;
  int32_t height;
  double fps;            // stream average rate
  double duration_sec;   // stream or container duration
  int64_t nb_frames;     // header frame count (0 if unknown)
  int32_t has_audio;
  int32_t sample_rate;   // native audio sample rate (0 if none)
};

// Probe container metadata without decoding (video.py:89-148 semantics:
// header nb_frames if present, else duration * fps).
int ingest_probe(const char* path, IngestInfo* out) {
  std::memset(out, 0, sizeof(*out));
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  int astream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (vstream >= 0) {
    AVStream* vs = fmt->streams[vstream];
    out->width = vs->codecpar->width;
    out->height = vs->codecpar->height;
    if (vs->avg_frame_rate.den > 0)
      out->fps = av_q2d(vs->avg_frame_rate);
    if (vs->duration > 0)
      out->duration_sec = vs->duration * av_q2d(vs->time_base);
    else if (fmt->duration > 0)
      out->duration_sec = fmt->duration / (double)AV_TIME_BASE;
    if (vs->nb_frames > 0)
      out->nb_frames = vs->nb_frames;
    else if (out->duration_sec > 0 && out->fps > 0)
      out->nb_frames = (int64_t)(out->duration_sec * out->fps);
  }
  if (astream >= 0) {
    out->has_audio = 1;
    out->sample_rate = fmt->streams[astream]->codecpar->sample_rate;
  }
  avformat_close_input(&fmt);
  return (vstream >= 0 || astream >= 0) ? 0 : -3;
}

// Decode video resampled to target_fps with the reference's PTS assignment
// rule (video.py:52-74): frame f is emitted for every pending target time t
// with pts(f) >= t - 0.5/target_fps, until max_frames targets are filled.
// Frames are converted to RGB24 and bilinearly scaled to out_w x out_h
// (pass 0,0 for native size). Returns number of frames written, < 0 on
// error. buf must hold max_frames * out_w * out_h * 3 bytes.
int64_t ingest_read_video(const char* path, double target_fps,
                          int64_t max_frames, int32_t out_w, int32_t out_h,
                          uint8_t* buf) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const AVCodec* codec = nullptr;
  int vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (vstream < 0 || !codec) {
    avformat_close_input(&fmt);
    return -3;
  }
  AVStream* vs = fmt->streams[vstream];
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, vs->codecpar);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  double time_base = av_q2d(vs->time_base);
  double duration_sec = 0;
  if (vs->duration > 0)
    duration_sec = vs->duration * time_base;
  else if (fmt->duration > 0)
    duration_sec = fmt->duration / (double)AV_TIME_BASE;
  int64_t target_count = duration_sec > 0
      ? (int64_t)(duration_sec * target_fps)
      : max_frames;
  if (target_count > max_frames) target_count = max_frames;
  if (target_count <= 0) target_count = max_frames;  // unknown duration

  if (out_w <= 0) out_w = ctx->width;
  if (out_h <= 0) out_h = ctx->height;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;
  double half_interval = 0.5 / target_fps;

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t emitted = 0;
  int64_t decoded_count = 0;
  bool done = false;

  auto emit = [&](AVFrame* f) {
    double pts_sec = (f->pts != AV_NOPTS_VALUE)
        ? f->pts * time_base
        : decoded_count / target_fps;  // fallback (video.py:56-60)
    decoded_count++;
    if (emitted >= target_count) { done = true; return; }
    double next_target = emitted / target_fps;
    if (pts_sec < next_target - half_interval) return;
    // Convert once, copy into every target slot this frame covers.
    sws = sws_getCachedContext(sws, f->width, f->height,
                               (AVPixelFormat)f->format, out_w, out_h,
                               AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                               nullptr, nullptr);
    if (!sws) { done = true; return; }
    uint8_t* first_dst = buf + emitted * frame_bytes;
    uint8_t* dst_data[4] = {first_dst, nullptr, nullptr, nullptr};
    int dst_linesize[4] = {out_w * 3, 0, 0, 0};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst_data, dst_linesize);
    emitted++;
    while (emitted < target_count &&
           pts_sec >= emitted / target_fps - half_interval) {
      std::memcpy(buf + emitted * frame_bytes, first_dst, frame_bytes);
      emitted++;
    }
    if (emitted >= target_count) done = true;
  };

  while (!done && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == vstream) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (!done && avcodec_receive_frame(ctx, frame) >= 0) emit(frame);
      }
    }
    av_packet_unref(pkt);
  }
  // Flush decoder.
  if (!done && avcodec_send_packet(ctx, nullptr) >= 0) {
    while (!done && avcodec_receive_frame(ctx, frame) >= 0) emit(frame);
  }

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return emitted;
}

// Decode the audio stream to mono float32 PCM at target_sr (the semantics
// of the reference's `ffmpeg -vn -acodec pcm_s16le -ar sr -ac 1` extraction
// + librosa.load, audio.py:19-29,70 — but in float straight to the buffer).
// Returns samples written, <0 on error, 0 if no audio stream.
int64_t ingest_read_audio(const char* path, int32_t target_sr, float* buf,
                          int64_t max_samples) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  const AVCodec* codec = nullptr;
  int astream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (astream < 0 || !codec) {
    avformat_close_input(&fmt);
    return 0;  // no audio
  }
  AVStream* as = fmt->streams[astream];
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, as->codecpar);
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -4;
  }

  SwrContext* swr = swr_alloc();
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  if (ctx->ch_layout.nb_channels > 0)
    av_channel_layout_copy(&in_layout, &ctx->ch_layout);
  else
    av_channel_layout_default(&in_layout, 2);
  av_opt_set_chlayout(swr, "in_chlayout", &in_layout, 0);
  av_opt_set_chlayout(swr, "out_chlayout", &mono, 0);
  av_opt_set_int(swr, "in_sample_rate", ctx->sample_rate, 0);
  av_opt_set_int(swr, "out_sample_rate", target_sr, 0);
  av_opt_set_sample_fmt(swr, "in_sample_fmt", ctx->sample_fmt, 0);
  av_opt_set_sample_fmt(swr, "out_sample_fmt", AV_SAMPLE_FMT_FLT, 0);
  if (swr_init(swr) < 0) {
    swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -5;
  }

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t written = 0;

  auto drain = [&](AVFrame* f) {
    if (written >= max_samples) return;
    uint8_t* out_ptr = (uint8_t*)(buf + written);
    int64_t space = max_samples - written;
    int out_n = swr_convert(swr, &out_ptr, (int)space,
                            f ? (const uint8_t**)f->data : nullptr,
                            f ? f->nb_samples : 0);
    if (out_n > 0) written += out_n;
  };

  while (written < max_samples && av_read_frame(fmt, pkt) >= 0) {
    if (pkt->stream_index == astream) {
      if (avcodec_send_packet(ctx, pkt) >= 0) {
        while (avcodec_receive_frame(ctx, frame) >= 0) drain(frame);
      }
    }
    av_packet_unref(pkt);
  }
  if (avcodec_send_packet(ctx, nullptr) >= 0) {
    while (avcodec_receive_frame(ctx, frame) >= 0) drain(frame);
  }
  drain(nullptr);  // flush resampler tail

  av_channel_layout_uninit(&in_layout);
  swr_free(&swr);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return written;
}

}  // extern "C"
