/* API client for audio-ident-tpu.
 *
 * Hand-written wrapper with the same surface as the reference's client
 * (reference: audio-ident-ui/src/lib/api/client.ts:112-240 —
 * fetchHealth/fetchVersion/fetchTracks/fetchTrackDetail/searchAudio/
 * ingestAudio/trackAudioUrl and ApiRequestError with {error:{code,message}}
 * parsing).  Types come from /openapi.json if you want to generate them.
 */

const API_BASE = "";

class ApiRequestError extends Error {
  constructor(status, code, message) {
    super(message);
    this.status = status;
    this.code = code;
  }
}

async function apiFetch(path, options = {}) {
  const resp = await fetch(API_BASE + path, options);
  if (!resp.ok) {
    let code = "UNKNOWN", message = `HTTP ${resp.status}`;
    try {
      const body = await resp.json();
      if (body.error) { code = body.error.code; message = body.error.message; }
    } catch (_) { /* non-JSON error body */ }
    throw new ApiRequestError(resp.status, code, message);
  }
  return resp.json();
}

const api = {
  fetchHealth: () => apiFetch("/health"),
  fetchVersion: () => apiFetch("/api/v1/version"),

  fetchTracks: ({ page = 1, pageSize = 20, search = "" } = {}) => {
    const q = new URLSearchParams({ page, pageSize });
    if (search) q.set("search", search);
    return apiFetch(`/api/v1/tracks?${q}`);
  },

  fetchTrackDetail: (id) => apiFetch(`/api/v1/tracks/${id}`),

  trackAudioUrl: (id) => `${API_BASE}/api/v1/tracks/${id}/audio`,

  searchAudio: (blob, filename, { mode = "both", maxResults = 10 } = {}) => {
    const form = new FormData();
    form.append("audio", blob, filename);
    form.append("mode", mode);
    form.append("max_results", String(maxResults));
    return apiFetch("/api/v1/search", { method: "POST", body: form });
  },

  deleteTrack: (id, adminKey) =>
    fetch(`${API_BASE}/api/v1/tracks/${id}`, {
      method: "DELETE",
      headers: { "X-Admin-Key": adminKey },
    }).then((r) => {
      if (!r.ok) throw new ApiRequestError(r.status, "DELETE_FAILED", `HTTP ${r.status}`);
    }),

  ingestAudio: (file, adminKey) => {
    const form = new FormData();
    form.append("audio", file, file.name);
    return apiFetch("/api/v1/ingest", {
      method: "POST",
      body: form,
      headers: { "X-Admin-Key": adminKey },
    });
  },

  /* streaming identification (no reference counterpart): open a session,
   * push raw PCM chunks (Float32Array from WebAudio works directly via
   * the f32 content-type), read the live verdict from each push. */
  createStream: () => apiFetch("/api/v1/stream", { method: "POST" }),

  pushStreamAudio: (streamId, pcmChunk, { float = true } = {}) =>
    apiFetch(`/api/v1/stream/${streamId}/audio`, {
      method: "POST",
      body: pcmChunk,
      headers: {
        "Content-Type": float ? "audio/pcm-f32le" : "application/octet-stream",
      },
    }),

  closeStream: (streamId) =>
    fetch(`${API_BASE}/api/v1/stream/${streamId}`, { method: "DELETE" }).then(
      (r) => {
        if (!r.ok && r.status !== 404)
          throw new ApiRequestError(r.status, "CLOSE_FAILED", `HTTP ${r.status}`);
      },
    ),
};

window.api = api;
window.ApiRequestError = ApiRequestError;
