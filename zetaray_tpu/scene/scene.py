"""Flattened scene arrays: the TPU-native SceneCore.

The reference keeps a flattened scene graph in array-of-levels form plus
shared VB/IB GPU buffers and per-TLAS-entry ``RT::MeshInstance`` records
(SceneCore.h:310-320, RtCommon.h:47-63). On TPU, everything static is baked
further: all instances are flattened into one **world-space triangle soup**
stored SoA, padded to lane multiples, with per-triangle material ids. Dynamic
instances/refit come later (round 2) via a per-instance transform pass before
intersection.

The device-side ``SceneBuffers`` pytree contains, crucially, the **Woop
unit-triangle transforms** laid out as a single ``[4, 3*T]`` matrix so that
ray/triangle intersection against T triangles is two MXU matmuls:

    O[N, 4] @ W[4, 3T] -> local ray origins (u, v, w rows, T lanes each)
    D[N, 4] @ W[4, 3T] -> local ray directions

followed by elementwise VPU work (see ``accel.intersect``). This replaces the
reference's DXR TLAS/BLAS + inline RayQuery (RtAccelerationStructure.h,
RayQuery.hlsli) with dense MXU compute -- the TPU-native answer to hardware
ray tracing for moderate triangle counts; BVH cluster culling stacks on top
for large scenes.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from .gltf import load_gltf, GltfMaterial
from ..core import transforms as T

LANE = 128  # TPU lane width; triangle counts padded to a multiple of this.


@dataclass
class MaterialsSoA:
    """Material table, SoA. Semantics follow the reference's Material.h
    (metalness workflow + emissive strength + IOR/transmission/coat)."""

    base_color: np.ndarray  # [M, 3]
    metallic: np.ndarray  # [M]
    roughness: np.ndarray  # [M]
    emissive: np.ndarray  # [M, 3]  factor * strength (linear radiance scale)
    ior: np.ndarray  # [M]
    transmission: np.ndarray  # [M]
    coat_weight: np.ndarray  # [M]
    coat_roughness: np.ndarray  # [M]
    double_sided: np.ndarray  # [M] bool
    base_color_tex: np.ndarray  # [M] int32, -1 = none
    normal_tex: np.ndarray | None = None  # [M] int32
    metallic_roughness_tex: np.ndarray | None = None  # [M] int32
    emissive_tex: np.ndarray | None = None  # [M] int32
    alpha_cutoff: np.ndarray | None = None  # [M]; > 0 only for MASK mode


@dataclass
class CpuScene:
    """Host-side flattened world-space triangle soup."""

    v0: np.ndarray  # [T, 3] world-space triangle vertices
    v1: np.ndarray
    v2: np.ndarray
    n0: np.ndarray  # [T, 3] world-space vertex normals
    n1: np.ndarray
    n2: np.ndarray
    uv0: np.ndarray  # [T, 2]
    uv1: np.ndarray
    uv2: np.ndarray
    mat_id: np.ndarray  # [T] int32
    materials: MaterialsSoA
    emissive_tris: np.ndarray  # [E] int32 indices into triangle arrays
    inst_id: np.ndarray | None = None  # [T] int32 instance index per tri
    inst_names: list | None = None  # instance index -> node name (picking)
    texture_paths: list | None = None  # texture index -> resolved path/uri

    def __post_init__(self):
        if self.inst_id is None:
            self.inst_id = np.zeros(self.v0.shape[0], np.int32)
        if self.inst_names is None:
            self.inst_names = ["<anon>"]

    @property
    def num_tris(self) -> int:
        return int(self.v0.shape[0])

    def geometric_normals(self) -> np.ndarray:
        n = np.cross(self.v1 - self.v0, self.v2 - self.v0)
        l = np.linalg.norm(n, axis=-1, keepdims=True)
        return n / np.maximum(l, 1e-20)

    def areas(self) -> np.ndarray:
        return 0.5 * np.linalg.norm(
            np.cross(self.v1 - self.v0, self.v2 - self.v0), axis=-1
        )

    def aabb(self):
        lo = np.minimum(np.minimum(self.v0.min(0), self.v1.min(0)), self.v2.min(0))
        hi = np.maximum(np.maximum(self.v0.max(0), self.v1.max(0)), self.v2.max(0))
        return lo, hi


_DEFAULT_MATERIAL = GltfMaterial(name="__default", metallic=0.0, roughness=1.0)


def _materials_soa(mats: list[GltfMaterial]) -> MaterialsSoA:
    if not mats:
        mats = [_DEFAULT_MATERIAL]
    return MaterialsSoA(
        base_color=np.stack([m.base_color[:3] for m in mats]).astype(np.float32),
        metallic=np.array([m.metallic for m in mats], np.float32),
        roughness=np.array([m.roughness for m in mats], np.float32),
        emissive=np.stack(
            [m.emissive_factor * m.emissive_strength for m in mats]
        ).astype(np.float32),
        ior=np.array([m.ior for m in mats], np.float32),
        transmission=np.array([m.transmission for m in mats], np.float32),
        coat_weight=np.array([m.coat_weight for m in mats], np.float32),
        coat_roughness=np.array([m.coat_roughness for m in mats], np.float32),
        double_sided=np.array([m.double_sided for m in mats], bool),
        base_color_tex=np.array([m.base_color_tex for m in mats], np.int32),
        normal_tex=np.array([m.normal_tex for m in mats], np.int32),
        metallic_roughness_tex=np.array(
            [m.metallic_roughness_tex for m in mats], np.int32
        ),
        emissive_tex=np.array([m.emissive_tex for m in mats], np.int32),
        alpha_cutoff=np.array(
            [m.alpha_cutoff if m.alpha_mode == "MASK" else 0.0 for m in mats],
            np.float32,
        ),
    )


def _flatten_prim(world, nrm_m, inst_idx, prim):
    """One prim -> world-space per-triangle corner arrays (a mesh-worker
    task; numpy releases the GIL on the large transforms)."""
    pos = T.transform_points(world, prim.positions.astype(np.float64))
    idx = prim.indices.reshape(-1, 3).astype(np.int64)
    if prim.normals is not None:
        nrm = prim.normals.astype(np.float64) @ nrm_m.T
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    else:
        nrm = None
    uv = prim.uvs if prim.uvs is not None else None
    a, b, c = idx[:, 0], idx[:, 1], idx[:, 2]
    if nrm is not None:
        n0, n1, n2 = nrm[a], nrm[b], nrm[c]
    else:
        g = np.cross(pos[b] - pos[a], pos[c] - pos[a])
        g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-20)
        n0 = n1 = n2 = g
    if uv is not None:
        uv0, uv1, uv2 = uv[a], uv[b], uv[c]
    else:
        z = np.zeros((idx.shape[0], 2), np.float32)
        uv0 = uv1 = uv2 = z
    mid = prim.material if prim.material >= 0 else 0
    return (
        pos[a], pos[b], pos[c], n0, n1, n2, uv0, uv1, uv2,
        np.full(idx.shape[0], mid, np.int32),
        np.full(idx.shape[0], inst_idx, np.int32),
    )


def load_scene(path, workers: int = 4) -> CpuScene:
    """glTF (path or pre-parsed GltfDoc) -> flattened world-space CpuScene
    (the loader's AddMeshes/AddInstance/AddEmissives rolled into one,
    glTF.cpp:1103-1266). Pass a GltfDoc when an AnimationRig is also built
    from the same document (scene.animation).

    Prim flattening fans out over ``workers`` threads in submission order
    (the reference's 4 mesh workers, glTF.cpp:1103-1266); results are
    concatenated deterministically regardless of completion order."""
    from concurrent.futures import ThreadPoolExecutor

    from .gltf import GltfDoc

    doc = path if isinstance(path, GltfDoc) else load_gltf(path)
    mats = list(doc.materials) if doc.materials else [_DEFAULT_MATERIAL]

    inst_names = []
    tasks = []
    for inst_idx, inst in enumerate(doc.instances):
        inst_names.append(inst.name)
        world = inst.world
        nrm_m = T.normal_matrix(world)
        for prim in inst.mesh_prims:
            tasks.append((world, nrm_m, inst_idx, prim))
    if workers > 1 and len(tasks) > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            flat = list(ex.map(lambda t: _flatten_prim(*t), tasks))
    else:
        flat = [_flatten_prim(*t) for t in tasks]
    (v0s, v1s, v2s, n0s, n1s, n2s, uv0s, uv1s, uv2s, mids, iids) = (
        [f[i] for f in flat] for i in range(11)
    )

    cat = lambda xs, dt=np.float32: np.concatenate(xs).astype(dt)
    mat_id = cat(mids, np.int32)
    materials = _materials_soa(mats)
    em_mask = materials.emissive[mat_id].max(axis=-1) > 0.0
    # Vertex quantization: round-trip normals through oct16 snorm and uvs
    # through half2 -- the reference's packed Vertex format (Mesh.h Vertex,
    # encoded on import), so shading sees the same quantized values its
    # kernels do. scene.packed.pack_vertex_buffer is the at-rest layout.
    from .packed import quantize_normals, quantize_uvs

    qn = lambda xs: quantize_normals(cat(xs))
    qu = lambda xs: quantize_uvs(cat(xs))
    return CpuScene(
        v0=cat(v0s), v1=cat(v1s), v2=cat(v2s),
        n0=qn(n0s), n1=qn(n1s), n2=qn(n2s),
        uv0=qu(uv0s), uv1=qu(uv1s), uv2=qu(uv2s),
        mat_id=mat_id,
        inst_id=cat(iids, np.int32),
        inst_names=inst_names,
        texture_paths=doc.textures,
        materials=materials,
        emissive_tris=np.nonzero(em_mask)[0].astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Device upload
# ---------------------------------------------------------------------------


def _woop_matrices(v0, v1, v2) -> np.ndarray:
    """Per-triangle world->unit-triangle affine transforms, packed [4, 3T].

    For triangle basis M = [e1 | e2 | n] (columns), W = M^-1: local coords of
    point p are W @ (p - v0) = (u, v, w); the triangle is w == 0, u,v >= 0,
    u + v <= 1. Row r in {u,v,w}, column layout [r*T + t] so a single
    [N,4] @ [4,3T] matmul yields all three rows for all triangles with T on
    the lane dimension. Degenerate (zero-area padding) triangles get W = 0,
    which makes every ray miss them (d'_w == 0 -> invalid).
    """
    t = v0.shape[0]
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)  # [T, 3, 3] columns e1,e2,n
    dets = np.linalg.det(m)
    good = np.abs(dets) > 1e-18
    w = np.zeros((t, 3, 4), np.float64)
    if good.any():
        inv = np.linalg.inv(m[good])
        w[good, :, :3] = inv
        w[good, :, 3] = -np.einsum("tij,tj->ti", inv, v0[good].astype(np.float64))
    # pack: out[c, r*T + i] = w[i, r, c]
    out = np.zeros((4, 3 * t), np.float32)
    for r in range(3):
        out[:, r * t : (r + 1) * t] = w[:, r, :].T.astype(np.float32)
    return out


def _pad_to(x: np.ndarray, n: int, value=0):
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, width, constant_values=value)


# Per-triangle attribute table layout (tri_attrs [Tp, ATTR_W] f32).
# Fetched in-kernel via one-hot matmul (accel.pallas_kernels) so the shading
# path needs no dynamic gathers. Interpolatable attrs store (A0, A1, A2)
# vertex rows; shading interpolates w0*A0 + u*A1 + v*A2.
class A:
    NG = 0  # 3: geometric normal
    N0 = 3  # 3x3: vertex normals
    N1 = 6
    N2 = 9
    UV0 = 12  # 3x2: vertex uvs
    UV1 = 14
    UV2 = 16
    BASE = 18  # 3: material base color
    METAL = 21
    ROUGH = 22
    EMISS = 23  # 3: emissive radiance (factor * strength)
    IOR = 26
    TRANS = 27
    DOUBLE = 28  # 1.0 if double-sided
    MATID = 29  # material index as float (debug/texture lookup later)
    EM_PDF_AREA = 30  # light-sampling pdf (area measure), 0 if not emissive
    TEXID = 31  # base-color texture index as float (-1 = none)
    COATW = 32  # coat weight
    COATR = 33  # coat roughness
    TANG = 34  # 3: triangle tangent (world, aligned to +u), for normal maps
    UVDENS = 37  # sqrt(uv area / world area): ray-cone mip selection
    ACUT = 38  # alpha cutoff (> 0 only for MASK-mode materials)
    ATEX = 39  # alpha-atlas slot as float (-1 = no alpha texture)
    INSTID = 40  # instance index as float (-1 = padding): motion vectors
    WIDTH = 48  # padded to a multiple of 8 sublanes


# Emissive-table attribute layout (em_attrs [Ep, EM_ATTR_W] f32), fetched by
# one-hot matmul in ops.lights after the alias-table pick.
class EA:
    V0 = 0  # 3
    E1 = 3  # 3
    E2 = 6  # 3
    NG = 9  # 3
    LE = 12  # 3
    PDF_AREA = 15
    TWO_SIDED = 16
    WIDTH = 24


@dataclass(frozen=True)
class SceneBuffers:
    """Device-side scene pytree (all jnp arrays, triangle dim padded to LANE).

    Registered as a pytree so it can be closed over / passed through jit.
    """

    woop: jnp.ndarray  # [4, 3*Tp] f32 unit-triangle transforms
    tri_attrs: jnp.ndarray  # [Tp, A.WIDTH] per-triangle shading attributes
    em_attrs: jnp.ndarray  # [Ep, EA.WIDTH] emissive-sampling attributes
    v0: jnp.ndarray  # [Tp, 3]
    e1: jnp.ndarray  # [Tp, 3] v1 - v0
    e2: jnp.ndarray  # [Tp, 3] v2 - v0
    ng: jnp.ndarray  # [Tp, 3] geometric normal (unit)
    n0: jnp.ndarray  # [Tp, 3] vertex normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # [Tp, 2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    mat_id: jnp.ndarray  # [Tp] i32
    inst_id: jnp.ndarray  # [Tp] i32 instance index (picking)
    num_tris: int  # static: true triangle count (rest is padding)
    # material table
    mat_base_color: jnp.ndarray  # [M, 3]
    mat_metallic: jnp.ndarray  # [M]
    mat_roughness: jnp.ndarray  # [M]
    mat_emissive: jnp.ndarray  # [M, 3]
    mat_ior: jnp.ndarray
    mat_transmission: jnp.ndarray
    mat_coat_weight: jnp.ndarray
    mat_coat_roughness: jnp.ndarray
    mat_double_sided: jnp.ndarray  # [M] bool
    # emissive light set (see ops.lights)
    em_tri: jnp.ndarray  # [Ep] i32 triangle index (or -1 padding)
    em_prob: jnp.ndarray  # [Ep] alias-table prob
    em_alias: jnp.ndarray  # [Ep] alias-table alias
    em_pdf: jnp.ndarray  # [Ep] selection pdf (sums to 1 over true entries)
    em_area: jnp.ndarray  # [Ep] triangle area
    em_of_tri: jnp.ndarray  # [Tp] i32: index into em_* for emissive tris, else -1
    em_power: jnp.ndarray  # scalar: total emissive power (luminance * area * pi)
    num_emissives: int
    # static: True if any material transmits / has coat -- compiles the
    # lobes out of the kernels otherwise (the reference's shader-variant
    # trick, IndirectLighting.h's 31 kernel variants)
    has_transmission: bool
    has_coat: bool
    has_cutout: bool
    # world bounds (for sky/tmax)
    world_lo: jnp.ndarray  # [3]
    world_hi: jnp.ndarray  # [3]
    # BVH-cluster bounds [M, 8] rows (lo.xyz, hi.xyz, pad) for the streaming
    # traversal (accel.stream); None = small scene, dense VMEM path. When
    # set, the triangle arrays are cluster-ordered: cluster c owns slots
    # [c*CLUSTER_SIZE, (c+1)*CLUSTER_SIZE) with degenerate padding.
    cluster_aabb: jnp.ndarray | None = None
    # Stream-traversal Woop layout [M, 4, 3*CLUSTER_SIZE]: per-cluster
    # contiguous blocks, pre-transposed for accel.stream's in-kernel form
    # (column r*C+j of cluster block = Woop row r of triangle j). Cached at
    # upload (and refreshed by refit) -- the relayout transpose costs ~1.5 ms
    # per call at 229k tris if done per trace.
    woop_stream: jnp.ndarray | None = None
    # Streaming shaded-hit table [Tp, A.WIDTH + 12]: tri_attrs row followed
    # by v0|e1|e2 (+3 pad). One XLA gather serves both the winning
    # triangle's attributes and its geometry (t/u/v recompute) in
    # accel.stream.closest_hit_stream_shaded -- row gathers cost ~2 ms per
    # take at 65k indices regardless of width, so fusing them matters.
    stream_attrs: jnp.ndarray | None = None
    # alpha-cutout atlas [K, ALPHA_RES, ALPHA_RES] (alpha channel of the
    # base-color texture of MASK-mode materials, resampled); None when no
    # material uses alpha masking. Traversal tests opacity against it
    # (reference: GBufferRT_Inline.hlsl:37-60 TestOpacity).
    alpha_tex: jnp.ndarray | None = None
    # STATIC: two-phase traversal cap for unbounded streaming closest-hit
    # queries (accel.stream._closest_call): phase 1 sweeps t <= cap (tight
    # frustums), phase 2 re-sweeps only the phase-1 misses. 0 = single
    # phase. Set at upload from the robust interior size (outlier clusters
    # like a 100x-oversized ground plane are excluded from the statistic,
    # exactly as the shaft-sort key bounds are -- stream._sort_perm).
    stream_tcap: float = 0.0

    def tree_flatten(self):
        static = (
            self.num_tris, self.num_emissives, self.has_transmission,
            self.has_coat, self.has_cutout, self.stream_tcap,
        )
        dynamic = tuple(
            getattr(self, f)
            for f in _SCENE_DYNAMIC_FIELDS
        )
        return dynamic, static

    @classmethod
    def tree_unflatten(cls, static, dynamic):
        kw = dict(zip(_SCENE_DYNAMIC_FIELDS, dynamic))
        (kw["num_tris"], kw["num_emissives"], kw["has_transmission"],
         kw["has_coat"], kw["has_cutout"], kw["stream_tcap"]) = static
        return cls(**kw)


_SCENE_DYNAMIC_FIELDS = [
    f
    for f in SceneBuffers.__dataclass_fields__
    if f not in (
        "num_tris", "num_emissives", "has_transmission", "has_coat",
        "has_cutout", "stream_tcap",
    )
]

import jax.tree_util  # noqa: E402

jax.tree_util.register_pytree_node(
    SceneBuffers, SceneBuffers.tree_flatten, SceneBuffers.tree_unflatten
)


# Streaming-traversal clustering: scenes above the dense-VMEM ceiling are
# reordered into BVH leaf clusters of CLUSTER_SIZE triangles (accel.stream).
CLUSTER_SIZE = 256
CLUSTER_THRESHOLD = 8192


def stream_attrs_table(tri_attrs, v0, e1, e2):
    """Device-side fused gather table for the streaming shaded-hit path."""
    tp = tri_attrs.shape[0]
    return jnp.concatenate(
        [tri_attrs, v0, e1, e2, jnp.zeros((tp, 3), tri_attrs.dtype)], axis=1
    )


def stream_woop_layout(woop, m: int, c: int):
    """Device-side [4, 3*Tp] Woop -> [M, 4, 3C] stream layout (accel.stream
    kernel operand: per-cluster contiguous, MXU/VPU-sliceable rows)."""
    tp = woop.shape[1] // 3
    w3 = woop.reshape(4, 3, tp)[:, :, : m * c]
    return w3.reshape(4, 3, m, c).transpose(2, 0, 1, 3).reshape(m, 4, 3 * c)


def _clusterize(cpu: CpuScene, c: int):
    """Reorder triangles into BVH-leaf clusters padded to ``c`` slots.

    Returns (new CpuScene with cluster-ordered arrays incl. degenerate pad
    triangles, cluster AABB rows [M, 8]). Pad slots have zero-area triangles
    (Woop transform 0 -> every ray misses) and are never emissive.
    """
    from ..accel.bvh import build_bvh

    bvh = build_bvh(cpu.v0, cpu.v1, cpu.v2, leaf_size=c)
    lo, hi, first, count = bvh.cluster_aabbs()
    m = lo.shape[0]
    t = cpu.num_tris
    slot_src = np.full(m * c, -1, np.int64)
    for k in range(m):
        slot_src[k * c : k * c + count[k]] = bvh.perm[first[k] : first[k] + count[k]]
    valid = slot_src >= 0

    def take(x, fill=0):
        out = np.full((m * c,) + x.shape[1:], fill, x.dtype)
        out[valid] = x[slot_src[valid]]
        return out

    inv = np.full(t, -1, np.int64)
    inv[slot_src[valid]] = np.nonzero(valid)[0]
    # pad slots collapse to a real vertex OF THEIR OWN CLUSTER: zero area
    # (every ray misses, Woop transform degenerates to 0) without inflating
    # the cluster/subcluster AABBs (slot k*c is always valid: leaves are
    # filled from the front and count >= 1)
    v0n, v1n, v2n = take(cpu.v0), take(cpu.v1), take(cpu.v2)
    fill = v0n[(np.arange(m * c) // c) * c]
    v0n[~valid] = fill[~valid]
    v1n[~valid] = fill[~valid]
    v2n[~valid] = fill[~valid]
    new = CpuScene(
        v0=v0n, v1=v1n, v2=v2n,
        n0=take(cpu.n0), n1=take(cpu.n1), n2=take(cpu.n2),
        uv0=take(cpu.uv0), uv1=take(cpu.uv1), uv2=take(cpu.uv2),
        mat_id=take(cpu.mat_id),
        inst_id=take(cpu.inst_id, fill=-1),
        inst_names=cpu.inst_names,
        texture_paths=cpu.texture_paths,
        materials=cpu.materials,
        emissive_tris=inv[cpu.emissive_tris].astype(np.int32),
    )
    aabb = np.zeros((m, 8), np.float32)
    aabb[:, 0:3] = lo
    aabb[:, 3:6] = hi
    return new, aabb


def _tangents_and_uv_density(cpu: CpuScene):
    """Per-triangle tangent frame + texel density for normal maps / ray-cone
    mip selection (reference: oct-encoded vertex tangents, Vertex.h; ray
    cones RT.hlsli:13-220). Tangent = world direction of +u in UV space,
    orthonormalized against the geometric normal; degenerate UVs fall back
    to an arbitrary ONB axis."""
    e1 = (cpu.v1 - cpu.v0).astype(np.float64)
    e2 = (cpu.v2 - cpu.v0).astype(np.float64)
    du1 = (cpu.uv1[:, 0] - cpu.uv0[:, 0]).astype(np.float64)
    dv1 = (cpu.uv1[:, 1] - cpu.uv0[:, 1]).astype(np.float64)
    du2 = (cpu.uv2[:, 0] - cpu.uv0[:, 0]).astype(np.float64)
    dv2 = (cpu.uv2[:, 1] - cpu.uv0[:, 1]).astype(np.float64)
    det = du1 * dv2 - du2 * dv1
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tang = (e1 * dv2[:, None] - e2 * dv1[:, None]) * inv[:, None]
    ng = np.cross(e1, e2)
    ng_l = np.linalg.norm(ng, axis=-1, keepdims=True)
    ng_u = ng / np.maximum(ng_l, 1e-20)
    # fallback: any vector orthogonal to ng
    alt = np.cross(ng_u, np.where(np.abs(ng_u[:, :1]) < 0.9,
                                  [[1.0, 0, 0]], [[0, 1.0, 0]]))
    tang = np.where(ok[:, None], tang, alt)
    tang -= ng_u * np.sum(tang * ng_u, -1, keepdims=True)
    tl = np.linalg.norm(tang, axis=-1, keepdims=True)
    tang = np.where(tl > 1e-12, tang / np.maximum(tl, 1e-20), alt)
    world_area = 0.5 * ng_l[:, 0]
    uv_area = 0.5 * np.abs(det)
    uvdens = np.sqrt(uv_area / np.maximum(world_area, 1e-20))
    return tang.astype(np.float32), uvdens.astype(np.float32)


ALPHA_RES = 256  # alpha-cutout atlas resolution


def _build_alpha_atlas(cpu: CpuScene):
    """Alpha atlas for MASK-mode materials: (atlas [K, R, R] | None,
    per-material slot np[M] (-1 = none))."""
    from .textures import load_texture

    mats = cpu.materials
    n_mats = len(mats.metallic)
    slot_of_mat = np.full(n_mats, -1, np.int32)
    cutoffs = getattr(mats, "alpha_cutoff", None)
    if cutoffs is None or not (np.asarray(cutoffs) > 0).any():
        return None, slot_of_mat
    paths = cpu.texture_paths or []
    layers = []
    slot_of_tex = {}
    for m in range(n_mats):
        if cutoffs[m] <= 0:
            continue
        ti = int(mats.base_color_tex[m])
        if ti < 0 or ti >= len(paths) or not paths[ti]:
            continue
        if ti not in slot_of_tex:
            mips = load_texture(paths[ti], srgb=True)
            if mips is None:
                continue
            a = np.asarray(mips[0][..., 3], np.float32)
            # nearest resample to the atlas resolution
            ys = (np.arange(ALPHA_RES) * a.shape[0] // ALPHA_RES).clip(0, a.shape[0] - 1)
            xs = (np.arange(ALPHA_RES) * a.shape[1] // ALPHA_RES).clip(0, a.shape[1] - 1)
            slot_of_tex[ti] = len(layers)
            layers.append(a[np.ix_(ys, xs)])
        slot_of_mat[m] = slot_of_tex[ti]
    if not layers:
        return None, slot_of_mat
    return np.stack(layers).astype(np.float32), slot_of_mat


def upload_scene(
    cpu: CpuScene, lane: int = LANE, cluster_size: int | None = None
) -> SceneBuffers:
    """CpuScene -> SceneBuffers: pad, build Woop transforms + emissive alias
    table, move to device. The analog of the reference's GpuMemory uploads +
    PreLighting alias-table build (PreLighting.cpp:483-546).

    ``cluster_size``: force BVH clustering for the streaming traversal
    (default: automatic above CLUSTER_THRESHOLD triangles; 0 disables)."""
    from ..core.sampling import build_alias_table
    from .light_build import emissive_powers

    if cluster_size is None:
        cluster_size = CLUSTER_SIZE if cpu.num_tris > CLUSTER_THRESHOLD else 0
    cluster_aabb = None
    stream_tcap = 0.0
    if cluster_size:
        cpu, aabb_np = _clusterize(cpu, cluster_size)
        cluster_aabb = jnp.asarray(aabb_np)
        # two-phase traversal cap = fraction of the ROBUST interior size
        # (mean +- 2.5 sigma of cluster centers, like stream._sort_perm's
        # sort-key bounds): most closest hits of interior hemisphere rays
        # land well inside it, so phase 1 sweeps short tight frustums and
        # phase 2 only the misses (accel.stream._closest_call).
        ctr = 0.5 * (aabb_np[:, 0:3] + aabb_np[:, 3:6])
        mu, sd = ctr.mean(0), ctr.std(0)
        lo_r = np.maximum(aabb_np[:, 0:3].min(0), mu - 2.5 * sd)
        hi_r = np.minimum(aabb_np[:, 3:6].max(0), mu + 2.5 * sd)
        stream_tcap = 0.35 * float(np.linalg.norm(hi_r - lo_r))

    t = cpu.num_tris
    tp = max(lane, ((t + lane - 1) // lane) * lane)
    v0 = _pad_to(cpu.v0, tp)
    v1 = _pad_to(cpu.v1, tp)
    v2 = _pad_to(cpu.v2, tp)
    woop = _woop_matrices(v0, v1, v2)
    ng = np.zeros((tp, 3), np.float32)
    ng[:t] = cpu.geometric_normals()

    # Emissive set + power-weighted alias table.
    em = cpu.emissive_tris
    e = em.shape[0]
    ep = max(lane, ((e + lane - 1) // lane) * lane) if e > 0 else lane
    if e > 0:
        powers = emissive_powers(cpu)
        prob, alias, pdf = build_alias_table(powers)
        total_power = float(powers.sum())
        em_area = cpu.areas()[em].astype(np.float32)
    else:
        prob = np.ones(0, np.float32)
        alias = np.zeros(0, np.int32)
        pdf = np.zeros(0, np.float32)
        em_area = np.zeros(0, np.float32)
        total_power = 0.0
    em_of_tri = np.full(tp, -1, np.int32)
    em_of_tri[em] = np.arange(e, dtype=np.int32)

    mats = cpu.materials

    # -- per-triangle attribute table (see class A)
    attrs = np.zeros((tp, A.WIDTH), np.float32)
    mid = cpu.mat_id
    attrs[:t, A.NG : A.NG + 3] = ng[:t]
    attrs[:t, A.N0 : A.N0 + 3] = cpu.n0
    attrs[:t, A.N1 : A.N1 + 3] = cpu.n1
    attrs[:t, A.N2 : A.N2 + 3] = cpu.n2
    attrs[:t, A.UV0 : A.UV0 + 2] = cpu.uv0
    attrs[:t, A.UV1 : A.UV1 + 2] = cpu.uv1
    attrs[:t, A.UV2 : A.UV2 + 2] = cpu.uv2
    attrs[:t, A.BASE : A.BASE + 3] = mats.base_color[mid]
    attrs[:t, A.METAL] = mats.metallic[mid]
    attrs[:t, A.ROUGH] = mats.roughness[mid]
    attrs[:t, A.EMISS : A.EMISS + 3] = mats.emissive[mid]
    attrs[:t, A.IOR] = mats.ior[mid]
    attrs[:t, A.TRANS] = mats.transmission[mid]
    attrs[:t, A.DOUBLE] = mats.double_sided[mid].astype(np.float32)
    attrs[:t, A.MATID] = mid.astype(np.float32)
    attrs[:t, A.TEXID] = mats.base_color_tex[mid].astype(np.float32)
    attrs[:t, A.COATW] = mats.coat_weight[mid]
    attrs[:t, A.COATR] = mats.coat_roughness[mid]
    tang, uvdens = _tangents_and_uv_density(cpu)
    attrs[:t, A.TANG : A.TANG + 3] = tang
    attrs[:t, A.UVDENS] = uvdens
    alpha_atlas, alpha_slot = _build_alpha_atlas(cpu)
    if getattr(mats, "alpha_cutoff", None) is not None:
        attrs[:t, A.ACUT] = np.where(alpha_slot[mid] >= 0, mats.alpha_cutoff[mid], 0.0)
    attrs[:t, A.ATEX] = alpha_slot[mid].astype(np.float32)
    attrs[:, A.INSTID] = -1.0
    attrs[:t, A.INSTID] = cpu.inst_id[:t].astype(np.float32)
    if e > 0:
        attrs[em, A.EM_PDF_AREA] = pdf / np.maximum(em_area, 1e-12)

    # -- emissive sampling table (see class EA)
    em_attrs = np.zeros((ep, EA.WIDTH), np.float32)
    if e > 0:
        em_attrs[:e, EA.V0 : EA.V0 + 3] = v0[em]
        em_attrs[:e, EA.E1 : EA.E1 + 3] = (v1 - v0)[em]
        em_attrs[:e, EA.E2 : EA.E2 + 3] = (v2 - v0)[em]
        em_attrs[:e, EA.NG : EA.NG + 3] = ng[em]
        em_attrs[:e, EA.LE : EA.LE + 3] = mats.emissive[mid[em]]
        em_attrs[:e, EA.PDF_AREA] = pdf / np.maximum(em_area, 1e-12)
        em_attrs[:e, EA.TWO_SIDED] = mats.double_sided[mid[em]].astype(np.float32)

    return SceneBuffers(
        woop=jnp.asarray(woop),
        tri_attrs=jnp.asarray(attrs),
        em_attrs=jnp.asarray(em_attrs),
        v0=jnp.asarray(v0),
        e1=jnp.asarray(v1 - v0),
        e2=jnp.asarray(v2 - v0),
        ng=jnp.asarray(ng),
        n0=jnp.asarray(_pad_to(cpu.n0, tp)),
        n1=jnp.asarray(_pad_to(cpu.n1, tp)),
        n2=jnp.asarray(_pad_to(cpu.n2, tp)),
        uv0=jnp.asarray(_pad_to(cpu.uv0, tp)),
        uv1=jnp.asarray(_pad_to(cpu.uv1, tp)),
        uv2=jnp.asarray(_pad_to(cpu.uv2, tp)),
        mat_id=jnp.asarray(_pad_to(cpu.mat_id, tp)),
        inst_id=jnp.asarray(_pad_to(cpu.inst_id, tp, value=-1)),
        num_tris=t,
        mat_base_color=jnp.asarray(mats.base_color),
        mat_metallic=jnp.asarray(mats.metallic),
        mat_roughness=jnp.asarray(mats.roughness),
        mat_emissive=jnp.asarray(mats.emissive),
        mat_ior=jnp.asarray(mats.ior),
        mat_transmission=jnp.asarray(mats.transmission),
        mat_coat_weight=jnp.asarray(mats.coat_weight),
        mat_coat_roughness=jnp.asarray(mats.coat_roughness),
        mat_double_sided=jnp.asarray(mats.double_sided),
        em_tri=jnp.asarray(_pad_to(em, ep, value=-1)),
        em_prob=jnp.asarray(_pad_to(prob, ep)),
        em_alias=jnp.asarray(_pad_to(alias, ep)),
        em_pdf=jnp.asarray(_pad_to(pdf, ep)),
        em_area=jnp.asarray(_pad_to(em_area, ep, value=1.0)),
        em_of_tri=jnp.asarray(em_of_tri),
        em_power=jnp.asarray(total_power, jnp.float32),
        num_emissives=e,
        has_transmission=bool((mats.transmission > 0).any()),
        has_coat=bool((mats.coat_weight > 0).any()),
        has_cutout=alpha_atlas is not None,
        world_lo=jnp.asarray(cpu.aabb()[0], jnp.float32),
        world_hi=jnp.asarray(cpu.aabb()[1], jnp.float32),
        cluster_aabb=cluster_aabb,
        woop_stream=(
            stream_woop_layout(
                jnp.asarray(woop), cluster_aabb.shape[0], cluster_size
            )
            if cluster_aabb is not None
            else None
        ),
        stream_attrs=(
            stream_attrs_table(
                jnp.asarray(attrs), jnp.asarray(v0),
                jnp.asarray(v1 - v0), jnp.asarray(v2 - v0),
            )
            if cluster_aabb is not None
            else None
        ),
        alpha_tex=jnp.asarray(alpha_atlas) if alpha_atlas is not None else None,
        stream_tcap=stream_tcap,
    )
