/* Hash-routed single-page app: search (record/upload), tracks, admin.
 * Mirrors the reference UI's routes and behaviors (reference:
 * audio-ident-ui/src/routes/search, /tracks, /tracks/[id], /admin/ingest;
 * recorder constraints min/max 3/30 s with a level meter:
 * AudioRecorder.svelte:13-60). */

const view = document.getElementById("view");

// -- health badge ------------------------------------------------------------

api.fetchHealth()
  .then((h) => { document.getElementById("health").textContent = `● ${h.status} v${h.version}`; })
  .catch(() => { document.getElementById("health").textContent = "● offline"; });

// -- helpers -------------------------------------------------------------------

function el(html) {
  const t = document.createElement("template");
  t.innerHTML = html.trim();
  return t.content.firstChild;
}

/* All server-derived strings (track tags come from uploaded-file metadata, so
 * they are attacker-controlled) MUST pass through esc() before being placed in
 * innerHTML. The reference UI gets this for free from Svelte's auto-escaping. */
function esc(v) {
  return String(v ?? "").replace(/[&<>"']/g, (c) => (
    { "&": "&amp;", "<": "&lt;", ">": "&gt;", '"': "&quot;", "'": "&#39;" }[c]
  ));
}

function fmtDur(s) {
  const m = Math.floor(s / 60), r = Math.round(s % 60);
  return `${m}:${String(r).padStart(2, "0")}`;
}

function errorBox(e) {
  return `<div class="error">${e.code ? `[${esc(e.code)}] ` : ""}${esc(e.message)}</div>`;
}

// -- search page ----------------------------------------------------------------

const MIN_SEC = 3, MAX_SEC = 30;

function renderSearch() {
  view.innerHTML = `
    <h1>Identify audio</h1>
    <section class="card">
      <div class="controls">
        <button id="rec">● Record</button>
        <canvas id="meter" width="160" height="18"></canvas>
        <span id="rec-time"></span>
        <label>mode
          <select id="mode">
            <option value="both">both</option>
            <option value="exact">exact</option>
            <option value="vibe">vibe</option>
          </select>
        </label>
      </div>
      <div id="drop" class="drop">…or drop / pick an audio file
        <input type="file" id="file" accept="audio/*">
      </div>
      <div id="status"></div>
    </section>
    <section id="results"></section>`;

  const status = document.getElementById("status");
  const mode = () => document.getElementById("mode").value;

  // recorder with level meter
  let recorder = null, recChunks = [], recStart = 0, meterRAF = 0;
  const recBtn = document.getElementById("rec");
  recBtn.onclick = async () => {
    if (recorder && recorder.state === "recording") { stopRec(); return; }
    try {
      const stream = await navigator.mediaDevices.getUserMedia({ audio: true });
      const mime = MediaRecorder.isTypeSupported("audio/webm;codecs=opus")
        ? "audio/webm;codecs=opus" : "";
      recorder = new MediaRecorder(stream, mime ? { mimeType: mime } : {});
      recChunks = [];
      recorder.ondataavailable = (e) => recChunks.push(e.data);
      recorder.onstop = async () => {
        stream.getTracks().forEach((t) => t.stop());
        cancelAnimationFrame(meterRAF);
        const dur = (Date.now() - recStart) / 1000;
        if (dur < MIN_SEC) { status.innerHTML = `<div class="error">Recording too short (min ${MIN_SEC}s)</div>`; return; }
        const blob = new Blob(recChunks, { type: recorder.mimeType || "audio/webm" });
        await doSearch(blob, "recording.webm");
      };
      // level meter via AnalyserNode (reference: AudioRecorder.svelte:35-50)
      const ctx = new AudioContext();
      const src = ctx.createMediaStreamSource(stream);
      const analyser = ctx.createAnalyser();
      analyser.fftSize = 256;
      src.connect(analyser);
      const buf = new Uint8Array(analyser.frequencyBinCount);
      const canvas = document.getElementById("meter").getContext("2d");
      const draw = () => {
        analyser.getByteTimeDomainData(buf);
        let peak = 0;
        for (const v of buf) peak = Math.max(peak, Math.abs(v - 128) / 128);
        canvas.clearRect(0, 0, 160, 18);
        canvas.fillStyle = peak > 0.8 ? "#d33" : "#4a4";
        canvas.fillRect(0, 0, peak * 160, 18);
        document.getElementById("rec-time").textContent =
          `${((Date.now() - recStart) / 1000).toFixed(0)}s`;
        if ((Date.now() - recStart) / 1000 >= MAX_SEC) stopRec();
        else meterRAF = requestAnimationFrame(draw);
      };
      recorder.start();
      recStart = Date.now();
      recBtn.textContent = "■ Stop";
      draw();
    } catch (e) {
      status.innerHTML = `<div class="error">microphone unavailable: ${esc(e.message)}</div>`;
    }
  };
  function stopRec() {
    recBtn.textContent = "● Record";
    if (recorder && recorder.state === "recording") recorder.stop();
  }

  // uploader (drag-drop + picker)
  const drop = document.getElementById("drop");
  const fileInput = document.getElementById("file");
  drop.ondragover = (e) => { e.preventDefault(); drop.classList.add("over"); };
  drop.ondragleave = () => drop.classList.remove("over");
  drop.ondrop = (e) => {
    e.preventDefault(); drop.classList.remove("over");
    if (e.dataTransfer.files[0]) doSearch(e.dataTransfer.files[0], e.dataTransfer.files[0].name);
  };
  fileInput.onchange = () => {
    if (fileInput.files[0]) doSearch(fileInput.files[0], fileInput.files[0].name);
  };

  async function doSearch(blob, name) {
    status.innerHTML = "<em>searching…</em>";
    document.getElementById("results").innerHTML = "";
    try {
      const res = await api.searchAudio(blob, name, { mode: mode() });
      status.innerHTML = `<small>${Number(res.query_duration_ms)} ms · mode ${esc(res.mode_used)} · ${esc(res.request_id)}</small>`;
      renderResults(res);
      sessionStorage.setItem("lastSearch", JSON.stringify(res));
    } catch (e) {
      status.innerHTML = errorBox(e);
    }
  }

  // state preservation (reference: routes/search/+page.svelte:29-60)
  const last = sessionStorage.getItem("lastSearch");
  if (last) renderResults(JSON.parse(last));
}

function renderResults(res) {
  const box = document.getElementById("results");
  if (!box) return;
  const lane = (title, items, render) => `
    <div class="card lane">
      <h2>${title}</h2>
      ${items.length ? items.map(render).join("") : "<p class='dim'>no matches</p>"}
    </div>`;
  box.innerHTML =
    lane("Exact matches", res.exact_matches, (m) => `
      <div class="match">
        <a href="#/tracks/${encodeURIComponent(m.track.id)}"><strong>${esc(m.track.title)}</strong></a>
        <span>${esc(m.track.artist ?? "")}</span>
        <span class="conf">conf ${esc((m.confidence * 100).toFixed(0))}%</span>
        <span class="dim">offset ${esc(m.offset_seconds?.toFixed(1) ?? "?")}s · ${Number(m.aligned_hashes)} hashes</span>
      </div>`) +
    lane("Vibe matches", res.vibe_matches, (m) => `
      <div class="match">
        <a href="#/tracks/${encodeURIComponent(m.track.id)}"><strong>${esc(m.track.title)}</strong></a>
        <span>${esc(m.track.artist ?? "")}</span>
        <span class="conf">sim ${esc((m.similarity * 100).toFixed(0))}%</span>
      </div>`);
}

// -- tracks pages ------------------------------------------------------------

async function renderTracks(page = 1, search = "") {
  view.innerHTML = `
    <h1>Tracks</h1>
    <div class="controls">
      <input id="q" placeholder="filter by title or artist">
    </div>
    <div id="list" class="card">loading…</div>
    <div id="pager" class="controls"></div>`;
  const q = document.getElementById("q");
  q.value = search; // property assignment, not HTML interpolation
  q.onkeydown = (e) => { if (e.key === "Enter") renderTracks(1, q.value); };
  try {
    const res = await api.fetchTracks({ page, pageSize: 20, search });
    const list = document.getElementById("list");
    list.innerHTML = res.data.length
      ? res.data.map((t) => `
          <div class="match">
            <a href="#/tracks/${encodeURIComponent(t.id)}"><strong>${esc(t.title)}</strong></a>
            <span>${esc(t.artist ?? "")}</span>
            <span class="dim">${esc(fmtDur(t.duration_seconds))}</span>
          </div>`).join("")
      : "<p class='dim'>no tracks</p>";
    const { page: p, totalPages } = res.pagination;
    const pager = document.getElementById("pager");
    pager.innerHTML = `
      <button id="pg-prev" ${p <= 1 ? "disabled" : ""}>prev</button>
      <span>page ${p} / ${Number(totalPages)}</span>
      <button id="pg-next" ${p >= totalPages ? "disabled" : ""}>next</button>`;
    // addEventListener instead of inline-onclick string interpolation: the
    // search string must never be embedded in executable HTML attributes.
    document.getElementById("pg-prev").addEventListener("click", () => renderTracks(p - 1, search));
    document.getElementById("pg-next").addEventListener("click", () => renderTracks(p + 1, search));
  } catch (e) {
    document.getElementById("list").innerHTML = errorBox(e);
  }
}

async function renderTrackDetail(id) {
  view.innerHTML = "<div class='card'>loading…</div>";
  try {
    const t = await api.fetchTrackDetail(id);
    view.innerHTML = `
      <h1>${esc(t.title)}</h1>
      <div class="card">
        <audio controls preload="metadata" src="${esc(api.trackAudioUrl(id))}"></audio>
        <table>
          <tr><td>artist</td><td>${esc(t.artist ?? "—")}</td></tr>
          <tr><td>album</td><td>${esc(t.album ?? "—")}</td></tr>
          <tr><td>duration</td><td>${esc(fmtDur(t.duration_seconds))}</td></tr>
          <tr><td>format</td><td>${esc(t.format ?? "—")} · ${esc(t.sample_rate ?? "?")} Hz · ${esc(t.channels ?? "?")}ch</td></tr>
          <tr><td>sha256</td><td class="mono">${esc(t.file_hash_sha256)}</td></tr>
          <tr><td>fingerprinted</td><td>${esc(t.olaf_indexed ? "yes" : "no")}</td></tr>
          <tr><td>embeddings</td><td>${t.embedding_model ? `${esc(t.embedding_model)} (${Number(t.embedding_dim)}d)` : "—"}</td></tr>
          <tr><td>ingested</td><td>${esc(t.ingested_at)}</td></tr>
        </table>
        <a href="#/tracks">← back</a>
        <button id="del" class="danger" style="float:right">delete</button>
      </div>`;
    document.getElementById("del").onclick = async () => {
      const key = sessionStorage.getItem("adminKey") || prompt("admin key");
      if (!key) return;
      sessionStorage.setItem("adminKey", key);
      try {
        await api.deleteTrack(id, key);
        location.hash = "#/tracks";
      } catch (e) {
        alert(`delete failed: ${e.message}`);
      }
    };
  } catch (e) {
    view.innerHTML = errorBox(e);
  }
}

// -- admin page ------------------------------------------------------------------

function renderAdmin() {
  view.innerHTML = `
    <h1>Admin · Ingest</h1>
    <section class="card">
      <label>admin key <input id="key" type="password"></label>
      <div id="adrop" class="drop">drop / pick audio to ingest
        <input type="file" id="afile" accept="audio/*" multiple>
      </div>
      <div id="alog"></div>
    </section>`;
  const key = document.getElementById("key");
  key.value = sessionStorage.getItem("adminKey") ?? "";
  const log = document.getElementById("alog");
  const handle = async (files) => {
    sessionStorage.setItem("adminKey", key.value);
    for (const f of files) {
      log.innerHTML += `<div>ingesting <strong>${esc(f.name)}</strong>…</div>`;
      try {
        const r = await api.ingestAudio(f, key.value);
        log.innerHTML += `<div class="ok">${esc(r.status)}: ${esc(r.title)} (${esc(r.track_id)})</div>`;
      } catch (e) {
        log.innerHTML += errorBox(e);
      }
    }
  };
  const drop = document.getElementById("adrop");
  drop.ondragover = (e) => { e.preventDefault(); drop.classList.add("over"); };
  drop.ondragleave = () => drop.classList.remove("over");
  drop.ondrop = (e) => { e.preventDefault(); drop.classList.remove("over"); handle(e.dataTransfer.files); };
  document.getElementById("afile").onchange = (e) => handle(e.target.files);
}

// -- router ------------------------------------------------------------------------

window.renderTracks = renderTracks;

function route() {
  const hash = location.hash || "#/search";
  const m = hash.match(/^#\/tracks\/(.+)$/);
  if (m) return renderTrackDetail(m[1]);
  if (hash.startsWith("#/tracks")) return renderTracks();
  if (hash.startsWith("#/admin")) return renderAdmin();
  return renderSearch();
}
window.onhashchange = route;
route();
