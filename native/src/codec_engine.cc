// Native codec engine: in-process audio decode/encode over the ffmpeg
// libraries (libavformat / libavcodec / libswresample).
//
// Role parity: the reference shells out to an `ffmpeg` BINARY per file
// (reference: audio-ident-service/app/audio/decode.py:41-62, two
// subprocesses per ingest).  This image ships the ffmpeg *libraries*
// (headers + .so) but no CLI, so we link them directly: decode happens
// in-process with no pipe/process boundary, and the eval harness gets
// REAL lossy-codec round-trips (MP3/Opus/Vorbis/AAC) instead of the
// MDCT simulation.
//
// C ABI for ctypes (no pybind11 in this image):
//   ai_codec_decode       : compressed bytes -> mono f32 PCM (optionally
//                           resampled to a target rate by swresample)
//   ai_codec_encode       : mono f32 PCM -> compressed bytes (muxed)
//   ai_codec_free         : free buffers returned by the two above
//   ai_codec_have_encoder : encoder availability probe by name
//   ai_codec_version      : libavformat version triple (sanity/debug)
//
// Memory contract: outputs are av_malloc'd by the engine and must be
// released with ai_codec_free.  Errors return a negative count and write
// a NUL-terminated message into the caller's err buffer.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/audio_fifo.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// libav logs decoder chatter (timestamp warnings etc.) to stderr at the
// default level; keep only real errors.
struct QuietLogs {
  QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} quiet_logs;

void set_err(char* err, int err_cap, const std::string& msg) {
  if (err == nullptr || err_cap <= 0) return;
  std::snprintf(err, static_cast<size_t>(err_cap), "%s", msg.c_str());
}

std::string av_errstr(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof(buf));
  return std::string(buf);
}

// ---- memory-backed AVIO (read side) ---------------------------------------

struct MemReader {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  auto* r = static_cast<MemReader*>(opaque);
  int64_t left = r->size - r->pos;
  if (left <= 0) return AVERROR_EOF;
  int n = static_cast<int>(left < buf_size ? left : buf_size);
  std::memcpy(buf, r->data + r->pos, static_cast<size_t>(n));
  r->pos += n;
  return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  auto* r = static_cast<MemReader*>(opaque);
  switch (whence & ~AVSEEK_FORCE) {
    case AVSEEK_SIZE:
      return r->size;
    case SEEK_SET:
      r->pos = offset;
      break;
    case SEEK_CUR:
      r->pos += offset;
      break;
    case SEEK_END:
      r->pos = r->size + offset;
      break;
    default:
      return AVERROR(EINVAL);
  }
  if (r->pos < 0) r->pos = 0;
  if (r->pos > r->size) r->pos = r->size;
  return r->pos;
}

// RAII-ish cleanup bundle for the decode path.
struct DecodeCtx {
  AVFormatContext* fmt = nullptr;
  AVIOContext* avio = nullptr;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  ~DecodeCtx() {
    if (swr) swr_free(&swr);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
      av_freep(&avio->buffer);
      avio_context_free(&avio);
    }
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

}  // namespace

extern "C" {

const char* ai_codec_version() {
  static char buf[64];
  std::snprintf(buf, sizeof(buf), "lavf %d.%d.%d",
                LIBAVFORMAT_VERSION_MAJOR, LIBAVFORMAT_VERSION_MINOR,
                LIBAVFORMAT_VERSION_MICRO);
  return buf;
}

int ai_codec_have_encoder(const char* name) {
  return avcodec_find_encoder_by_name(name) != nullptr ? 1 : 0;
}

void ai_codec_free(void* p) { av_free(p); }

// Decode `data[0:len]` (any container avformat can probe) to mono f32 PCM.
// target_rate 0 keeps the source rate.  On success returns the sample
// count, stores an av_malloc'd buffer in *out_pcm, and fills *out_rate /
// *out_channels (source channel count).  On failure returns <0.
int64_t ai_codec_decode(const uint8_t* data, int64_t len, int target_rate,
                        float** out_pcm, int* out_rate, int* out_channels,
                        char* err, int err_cap) {
  DecodeCtx c;
  MemReader reader{data, len, 0};

  constexpr int kIoBuf = 1 << 16;
  uint8_t* iobuf = static_cast<uint8_t*>(av_malloc(kIoBuf));
  if (!iobuf) {
    set_err(err, err_cap, "av_malloc failed");
    return -1;
  }
  c.avio = avio_alloc_context(iobuf, kIoBuf, 0, &reader, mem_read, nullptr,
                              mem_seek);
  if (!c.avio) {
    av_free(iobuf);
    set_err(err, err_cap, "avio_alloc_context failed");
    return -1;
  }
  c.fmt = avformat_alloc_context();
  if (!c.fmt) {
    set_err(err, err_cap, "avformat_alloc_context failed");
    return -1;
  }
  c.fmt->pb = c.avio;
  int rc = avformat_open_input(&c.fmt, nullptr, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, err_cap, "open_input: " + av_errstr(rc));
    return -1;
  }
  rc = avformat_find_stream_info(c.fmt, nullptr);
  if (rc < 0) {
    set_err(err, err_cap, "find_stream_info: " + av_errstr(rc));
    return -1;
  }
  const AVCodec* decoder = nullptr;
  int stream_idx =
      av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &decoder, 0);
  if (stream_idx < 0 || !decoder) {
    set_err(err, err_cap, "no decodable audio stream");
    return -1;
  }
  AVStream* stream = c.fmt->streams[stream_idx];
  c.dec = avcodec_alloc_context3(decoder);
  if (!c.dec ||
      avcodec_parameters_to_context(c.dec, stream->codecpar) < 0 ||
      avcodec_open2(c.dec, decoder, nullptr) < 0) {
    set_err(err, err_cap, "decoder open failed");
    return -1;
  }
  if (c.dec->ch_layout.nb_channels <= 0)
    av_channel_layout_default(&c.dec->ch_layout, 1);

  const int src_rate = c.dec->sample_rate;
  const int dst_rate = target_rate > 0 ? target_rate : src_rate;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  rc = swr_alloc_set_opts2(&c.swr, &mono, AV_SAMPLE_FMT_FLT, dst_rate,
                           &c.dec->ch_layout, c.dec->sample_fmt, src_rate,
                           0, nullptr);
  if (rc < 0 || swr_init(c.swr) < 0) {
    set_err(err, err_cap, "swresample init failed");
    return -1;
  }

  c.pkt = av_packet_alloc();
  c.frame = av_frame_alloc();
  std::vector<float> pcm;
  if (stream->duration > 0)
    pcm.reserve(static_cast<size_t>(
        av_rescale_q(stream->duration, stream->time_base, {1, dst_rate})));
  std::vector<float> chunk;

  auto drain_swr = [&](const AVFrame* in) -> int {
    const uint8_t** in_data =
        in ? const_cast<const uint8_t**>(in->extended_data) : nullptr;
    int in_n = in ? in->nb_samples : 0;
    int64_t max_out =
        av_rescale_rnd(swr_get_delay(c.swr, src_rate) + in_n, dst_rate,
                       src_rate, AV_ROUND_UP) +
        64;
    chunk.resize(static_cast<size_t>(max_out));
    uint8_t* out_planes[1] = {reinterpret_cast<uint8_t*>(chunk.data())};
    int got = swr_convert(c.swr, out_planes, static_cast<int>(max_out),
                          in_data, in_n);
    if (got < 0) return got;
    pcm.insert(pcm.end(), chunk.begin(), chunk.begin() + got);
    return 0;
  };

  bool eof = false;
  while (!eof) {
    rc = av_read_frame(c.fmt, c.pkt);
    if (rc == AVERROR_EOF) {
      eof = true;
    } else if (rc < 0) {
      set_err(err, err_cap, "read_frame: " + av_errstr(rc));
      return -1;
    } else if (c.pkt->stream_index != stream_idx) {
      av_packet_unref(c.pkt);
      continue;
    }
    rc = avcodec_send_packet(c.dec, eof ? nullptr : c.pkt);
    av_packet_unref(c.pkt);
    if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
      set_err(err, err_cap, "send_packet: " + av_errstr(rc));
      return -1;
    }
    while (true) {
      rc = avcodec_receive_frame(c.dec, c.frame);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
      if (rc < 0) {
        set_err(err, err_cap, "receive_frame: " + av_errstr(rc));
        return -1;
      }
      if (drain_swr(c.frame) < 0) {
        set_err(err, err_cap, "swr_convert failed");
        return -1;
      }
      av_frame_unref(c.frame);
    }
  }
  if (drain_swr(nullptr) < 0) {  // flush the resampler's tail
    set_err(err, err_cap, "swr flush failed");
    return -1;
  }

  if (pcm.empty()) {
    set_err(err, err_cap, "no audio samples decoded");
    return -1;
  }
  float* out = static_cast<float*>(av_malloc(pcm.size() * sizeof(float)));
  if (!out) {
    set_err(err, err_cap, "output alloc failed");
    return -1;
  }
  std::memcpy(out, pcm.data(), pcm.size() * sizeof(float));
  *out_pcm = out;
  *out_rate = dst_rate;
  *out_channels = c.dec->ch_layout.nb_channels;
  return static_cast<int64_t>(pcm.size());
}

// Encode mono f32 PCM to `codec_name` inside `format_name`, writing the
// muxed bytes to an av_malloc'd buffer in *out.  Returns the byte count,
// or <0 on error.  The encoder's nearest supported sample rate is used
// (swresample bridges); bitrate_bps <= 0 leaves the encoder default.
int64_t ai_codec_encode(const float* pcm, int64_t n, int sample_rate,
                        const char* codec_name, const char* format_name,
                        int bitrate_bps, uint8_t** out, char* err,
                        int err_cap) {
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    set_err(err, err_cap, std::string("no encoder: ") + codec_name);
    return -1;
  }
  // nearest supported sample rate (e.g. libopus only takes 48k family)
  int enc_rate = sample_rate;
  if (codec->supported_samplerates) {
    int best = 0;
    for (const int* r = codec->supported_samplerates; *r; ++r)
      if (best == 0 ||
          std::abs(*r - sample_rate) < std::abs(best - sample_rate))
        best = *r;
    if (best) enc_rate = best;
  }
  // preferred sample format: flt/fltp if offered, else the first listed
  AVSampleFormat enc_fmt = AV_SAMPLE_FMT_NONE;
  if (codec->sample_fmts) {
    for (const AVSampleFormat* f = codec->sample_fmts;
         *f != AV_SAMPLE_FMT_NONE; ++f)
      if (*f == AV_SAMPLE_FMT_FLT || *f == AV_SAMPLE_FMT_FLTP) {
        enc_fmt = *f;
        break;
      }
    if (enc_fmt == AV_SAMPLE_FMT_NONE) enc_fmt = codec->sample_fmts[0];
  } else {
    enc_fmt = AV_SAMPLE_FMT_FLT;
  }

  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, format_name, nullptr) <
          0 ||
      !fmt) {
    set_err(err, err_cap, std::string("no muxer: ") + format_name);
    return -1;
  }
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  SwrContext* swr = nullptr;
  AVAudioFifo* fifo = nullptr;
  uint8_t* dyn = nullptr;
  int64_t result = -1;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;

  // single-exit cleanup keeps the dozen allocations leak-free on any path
  auto fail = [&](const std::string& msg) {
    set_err(err, err_cap, msg);
    result = -1;
  };

  do {
    if (!enc || !pkt || !frame) {
      fail("alloc failed");
      break;
    }
    enc->sample_rate = enc_rate;
    enc->sample_fmt = enc_fmt;
    av_channel_layout_copy(&enc->ch_layout, &mono);
    enc->time_base = {1, enc_rate};
    if (bitrate_bps > 0) enc->bit_rate = bitrate_bps;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    int rc = avcodec_open2(enc, codec, nullptr);
    if (rc < 0) {
      fail("encoder open: " + av_errstr(rc));
      break;
    }
    AVStream* stream = avformat_new_stream(fmt, nullptr);
    if (!stream || avcodec_parameters_from_context(stream->codecpar, enc) < 0) {
      fail("stream setup failed");
      break;
    }
    stream->time_base = enc->time_base;
    if (avio_open_dyn_buf(&fmt->pb) < 0) {
      fail("dyn buf open failed");
      break;
    }
    rc = avformat_write_header(fmt, nullptr);
    if (rc < 0) {
      fail("write_header: " + av_errstr(rc));
      break;
    }

    rc = swr_alloc_set_opts2(&swr, &mono, enc_fmt, enc_rate, &mono,
                             AV_SAMPLE_FMT_FLT, sample_rate, 0, nullptr);
    if (rc < 0 || swr_init(swr) < 0) {
      fail("swr init failed");
      break;
    }
    fifo = av_audio_fifo_alloc(enc_fmt, 1, 1 << 16);
    if (!fifo) {
      fail("fifo alloc failed");
      break;
    }

    const int frame_size = enc->frame_size > 0 ? enc->frame_size : 1024;
    int64_t pts = 0;
    bool mux_err = false;

    auto send_frame = [&](AVFrame* f) -> bool {
      int r = avcodec_send_frame(enc, f);
      if (r < 0 && r != AVERROR_EOF) return false;
      while (true) {
        r = avcodec_receive_packet(enc, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return true;
        if (r < 0) return false;
        av_packet_rescale_ts(pkt, enc->time_base, stream->time_base);
        pkt->stream_index = stream->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) return false;
      }
    };

    auto drain_fifo = [&](bool final_flush) -> bool {
      while (av_audio_fifo_size(fifo) >= frame_size ||
             (final_flush && av_audio_fifo_size(fifo) > 0)) {
        int take = av_audio_fifo_size(fifo) < frame_size
                       ? av_audio_fifo_size(fifo)
                       : frame_size;
        av_frame_unref(frame);
        frame->nb_samples = take;
        frame->format = enc_fmt;
        av_channel_layout_copy(&frame->ch_layout, &mono);
        frame->sample_rate = enc_rate;
        if (av_frame_get_buffer(frame, 0) < 0) return false;
        if (av_audio_fifo_read(
                fifo, reinterpret_cast<void**>(frame->extended_data), take) <
            take)
          return false;
        frame->pts = pts;
        pts += take;
        if (!send_frame(frame)) return false;
      }
      return true;
    };

    // resample-push-drain over input blocks, then flush everything
    constexpr int kBlock = 1 << 14;
    std::vector<uint8_t> conv(
        static_cast<size_t>(av_rescale_rnd(kBlock + 4096, enc_rate,
                                           sample_rate, AV_ROUND_UP)) *
            av_get_bytes_per_sample(enc_fmt) +
        64);
    for (int64_t off = 0; off <= n && !mux_err; off += kBlock) {
      const float* in_ptr = pcm + off;
      int in_n = static_cast<int>(n - off < kBlock ? n - off : kBlock);
      bool last = off + kBlock > n;
      int64_t max_out = av_rescale_rnd(
          swr_get_delay(swr, sample_rate) + in_n, enc_rate, sample_rate,
          AV_ROUND_UP) + 64;
      if (conv.size() <
          static_cast<size_t>(max_out) * av_get_bytes_per_sample(enc_fmt))
        conv.resize(static_cast<size_t>(max_out) *
                    av_get_bytes_per_sample(enc_fmt));
      uint8_t* planes[1] = {conv.data()};
      const uint8_t* in_planes[1] = {
          reinterpret_cast<const uint8_t*>(in_ptr)};
      int got = swr_convert(swr, planes, static_cast<int>(max_out),
                            in_n > 0 ? in_planes : nullptr, in_n);
      if (got < 0) {
        mux_err = true;
        break;
      }
      if (got > 0) {
        void* fifo_planes[1] = {conv.data()};
        if (av_audio_fifo_write(fifo, fifo_planes, got) < got) {
          mux_err = true;
          break;
        }
      }
      if (!drain_fifo(last)) {
        mux_err = true;
        break;
      }
      if (last) break;
    }
    if (mux_err || !send_frame(nullptr)) {  // flush encoder
      fail("encode/mux failed");
      break;
    }
    if (av_write_trailer(fmt) < 0) {
      fail("write_trailer failed");
      break;
    }
    int size = avio_close_dyn_buf(fmt->pb, &dyn);
    fmt->pb = nullptr;
    if (size <= 0) {
      fail("empty output");
      break;
    }
    uint8_t* copy = static_cast<uint8_t*>(av_malloc(size));
    if (!copy) {
      fail("output alloc failed");
      break;
    }
    std::memcpy(copy, dyn, static_cast<size_t>(size));
    *out = copy;
    result = size;
  } while (false);

  if (fmt && fmt->pb) {
    uint8_t* tmp = nullptr;
    avio_close_dyn_buf(fmt->pb, &tmp);
    av_free(tmp);
    fmt->pb = nullptr;
  }
  av_free(dyn);
  if (fifo) av_audio_fifo_free(fifo);
  if (swr) swr_free(&swr);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  avformat_free_context(fmt);
  return result;
}

}  // extern "C"
