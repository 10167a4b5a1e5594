"""Service over a sharded index: MESH_SHARDS=8 on the virtual CPU mesh —
the full HTTP ingest+search flow with matching fanned out over the mesh."""

import numpy as np
import pytest
import httpx

from audio_ident_tpu.service.app import create_app
from audio_ident_tpu.service.catalog import Catalog
from audio_ident_tpu.service.settings import Settings
from audio_ident_tpu.service.state import EngineState

from tests.conftest import synth_audio, wav_bytes

pytestmark = pytest.mark.anyio

ADMIN = {"x-admin-key": "k"}


@pytest.fixture()
async def client(tmp_path):
    settings = Settings(
        data_root=str(tmp_path / "d"),
        admin_api_key="k",
        max_tracks=1 << 12,
        mesh_shards=8,
        exact_timeout_sec=300.0,
        vibe_timeout_sec=300.0,
    )
    engine = EngineState(max_tracks=settings.max_tracks, mesh_shards=8)
    app = create_app(settings, catalog=Catalog(":memory:"), engine=engine)
    async with httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    ) as c:
        yield c


async def test_sharded_service_search(client):
    pcm = synth_audio(np.random.default_rng(60), 20.0, 16000)
    r = await client.post(
        "/api/v1/ingest",
        files={"audio": ("t.wav", wav_bytes(pcm), "audio/wav")},
        headers=ADMIN,
    )
    assert r.status_code == 201, r.text
    tid = r.json()["track_id"]
    await client.post(
        "/api/v1/ingest",
        files={
            "audio": (
                "d.wav",
                wav_bytes(synth_audio(np.random.default_rng(61), 12.0, 16000)),
                "audio/wav",
            )
        },
        headers=ADMIN,
    )

    clip = wav_bytes(pcm[4 * 16000 : 12 * 16000])
    r = await client.post(
        "/api/v1/search",
        files={"audio": ("c.wav", clip, "audio/wav")},
        data={"mode": "exact"},
    )
    assert r.status_code == 200, r.text
    top = r.json()["exact_matches"][0]
    assert top["track"]["id"] == tid
    assert top["confidence"] == 1.0
    assert abs(top["offset_seconds"] - 4.0) < 0.5


# -- engine-level mesh tests: churn, bit-identity, deletes (VERDICT r1 #6) ----


def _uuid(i: int) -> str:
    return f"00000000-0000-0000-0000-{i:012d}"


@pytest.fixture(scope="module")
def churn_tracks():
    rng = np.random.default_rng(77)
    return [synth_audio(np.random.default_rng(7000 + i), 10.0) for i in range(48)], rng


async def test_concurrent_bulk_ingest_and_query(churn_tracks, tmp_path_factory):
    """BASELINE config #5 shape at test scale: bulk ingest streams into the
    mesh-sharded engine WHILE searches run; every mid-churn search must
    return the correct track, and the final state must answer every query
    BIT-IDENTICALLY to a single-chip engine built from the same tracks."""
    import asyncio

    tracks, _ = churn_tracks
    mesh_engine = EngineState(max_tracks=1 << 10, mesh_shards=8)

    # seed a third of the library so early queries have something to hit
    seed_n = 16
    for i in range(seed_n):
        await mesh_engine.fingerprint_and_index(_uuid(i), tracks[i])

    async def bulk_ingest():
        for i in range(seed_n, len(tracks)):
            await mesh_engine.fingerprint_and_index(_uuid(i), tracks[i])

    mid_results: list[tuple[int, list]] = []

    async def query_churn():
        # queries race the ingest stream (single-writer: engine serializes
        # device mutation; searches interleave between appends)
        for k in range(8):
            t = k % seed_n  # only query tracks guaranteed present
            res = await mesh_engine.exact_search(tracks[t][16000 * 1 : 16000 * 9])
            mid_results.append((t, res))
            await asyncio.sleep(0)

    await asyncio.gather(bulk_ingest(), query_churn())
    for t, res in mid_results:
        assert res, f"mid-churn query for track {t} returned nothing"
        assert res[0].track_row == t
        assert res[0].confidence == 1.0

    # single-chip twin: same tracks, same order
    solo_engine = EngineState(max_tracks=1 << 10)
    for i, x in enumerate(tracks):
        await solo_engine.fingerprint_and_index(_uuid(i), x)

    for t in range(0, len(tracks), 5):
        q = tracks[t][16000 * 2 : 16000 * 8]
        mesh_res = await mesh_engine.exact_search(q)
        solo_res = await solo_engine.exact_search(q)
        assert [
            (c.track_row, c.aligned_hashes, c.confidence) for c in mesh_res
        ] == [
            (c.track_row, c.aligned_hashes, c.confidence) for c in solo_res
        ], f"mesh/single-chip divergence on track {t}"
        np.testing.assert_allclose(
            [c.offset_seconds for c in mesh_res],
            [c.offset_seconds for c in solo_res],
            atol=1e-3,
        )
        assert mesh_res[0].track_row == t

    await mesh_engine.close()
    await solo_engine.close()


async def test_sharded_delete_visibility(churn_tracks):
    """Tombstones propagate to every shard: a deleted track disappears from
    mesh search while other tracks keep bit-identical scores."""
    tracks, _ = churn_tracks
    engine = EngineState(max_tracks=1 << 10, mesh_shards=8)
    for i in range(4):
        await engine.fingerprint_and_index(_uuid(i), tracks[i])

    q_dead = tracks[2][16000 * 1 : 16000 * 9]
    q_live = tracks[3][16000 * 1 : 16000 * 9]
    before_live = await engine.exact_search(q_live)
    assert (await engine.exact_search(q_dead))[0].track_row == 2

    assert await engine.delete_track(_uuid(2))
    after_dead = await engine.exact_search(q_dead)
    assert all(c.track_row != 2 for c in after_dead)
    after_live = await engine.exact_search(q_live)
    assert [(c.track_row, c.aligned_hashes) for c in after_live] == [
        (c.track_row, c.aligned_hashes) for c in before_live if c.track_row != 2
    ]
    await engine.close()


async def test_sharded_snapshot_restart(churn_tracks, tmp_path):
    """Snapshot written by a mesh engine reloads into a fresh mesh engine
    (shard layout is derived state — the snapshot is layout-agnostic)."""
    tracks, _ = churn_tracks
    idx_dir = tmp_path / "idx"
    engine = EngineState(max_tracks=1 << 10, mesh_shards=8, index_dir=idx_dir)
    for i in range(3):
        await engine.fingerprint_and_index(_uuid(i), tracks[i])
    await engine.snapshot()
    await engine.close()

    reborn = EngineState(max_tracks=1 << 10, mesh_shards=8, index_dir=idx_dir)
    res = await reborn.exact_search(tracks[1][16000 * 2 : 16000 * 8])
    assert res and res[0].track_row == 1 and res[0].confidence == 1.0
    await reborn.close()
