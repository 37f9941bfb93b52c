// tape_core: native (C++) wire-tape encoder and CPU oracle evaluator.
//
// The reference implements its tape builder and scene model natively in Rust
// (src/ray_marching/csg/builder.rs, csg/*); this is the TPU build's native
// counterpart: a small, dependency-free C++ library exposed through a C ABI
// (loaded from Python via ctypes, see raymarch_tpu/native.py). Two roles:
//
//  1. Wire-tape encoding/validation at native speed for large procedural
//     scenes (the hot host-side path when scenes are edited every frame,
//     mirroring builder.rs:41-61 semantics: postorder opcode stream with
//     bit-cast f32 params).
//  2. An independent tape interpreter (same opcode semantics as the WGSL
//     stack machine, ray_marching.wgsl:187-252) used as a second oracle to
//     cross-check the NumPy oracle and the device paths.
//
// Opcode ABI: see raymarch_tpu/ops/opcodes.py (kept in sync by
// tests/test_native.py golden checks).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Wire opcodes (must match raymarch_tpu/ops/opcodes.py).
enum : uint32_t {
  OP_SPHERE = 0,
  OP_BOX = 1,
  OP_PLANE = 2,
  OP_TORUS = 3,
  OP_CYLINDER = 4,
  OP_CAPSULE = 5,
  OP_CONE = 6,
  OP_BOX_ROT = 11,
  OP_TORUS_ROT = 13,
  OP_CYLINDER_ROT = 14,
  OP_CAPSULE_ROT = 15,
  OP_CONE_ROT = 16,
  OP_UNION = 100,
  OP_SUBTRACTION = 101,
  OP_INTERSECTION = 102,
  OP_SMOOTH_UNION = 110,
  OP_SMOOTH_SUBTRACTION = 111,
  OP_SMOOTH_INTERSECTION = 112,
  OP_ROUND = 120,
  OP_ONION = 121,
  OP_MATERIAL = 130,  // postfix albedo attribute (extension; see opcodes.py)
};

int param_count(uint32_t op) {
  switch (op) {
    case OP_SPHERE: return 4;
    case OP_BOX: return 6;
    case OP_PLANE: return 4;
    case OP_TORUS: return 5;
    case OP_CYLINDER: return 5;
    case OP_CAPSULE: return 5;
    case OP_CONE: return 6;
    case OP_BOX_ROT: return 10;
    case OP_TORUS_ROT: return 9;
    case OP_CYLINDER_ROT: return 9;
    case OP_CAPSULE_ROT: return 9;
    case OP_CONE_ROT: return 10;
    case OP_UNION: case OP_SUBTRACTION: case OP_INTERSECTION: return 0;
    case OP_SMOOTH_UNION: case OP_SMOOTH_SUBTRACTION:
    case OP_SMOOTH_INTERSECTION: case OP_ROUND: case OP_ONION: return 1;
    case OP_MATERIAL: return 3;
    default: return -1;
  }
}

int stack_delta(uint32_t op) {
  if (op < 100) return +1;           // primitives push
  if (op >= 120) return 0;           // unary ops
  return -1;                          // binary ops pop 2 push 1
}

inline float f32(uint32_t bits) {
  float f;
  std::memcpy(&f, &bits, sizeof(f));
  return f;
}

struct Vec3 {
  float x, y, z;
};

inline Vec3 rot_inv(const float* q, Vec3 v) {
  // Rotate v by conjugate of unit quaternion q=(w,x,y,z).
  float w = q[0], x = -q[1], y = -q[2], z = -q[3];
  float tx = 2.0f * (y * v.z - z * v.y);
  float ty = 2.0f * (z * v.x - x * v.z);
  float tz = 2.0f * (x * v.y - y * v.x);
  return {v.x + w * tx + (y * tz - z * ty),
          v.y + w * ty + (z * tx - x * tz),
          v.z + w * tz + (x * ty - y * tx)};
}

inline float sd_sphere(Vec3 p, const float* c, float r) {
  float dx = p.x - c[0], dy = p.y - c[1], dz = p.z - c[2];
  return std::sqrt(dx * dx + dy * dy + dz * dz) - r;
}

inline float sd_box_local(Vec3 q, const float* he) {
  float qx = std::fabs(q.x) - he[0];
  float qy = std::fabs(q.y) - he[1];
  float qz = std::fabs(q.z) - he[2];
  float ox = qx > 0 ? qx : 0, oy = qy > 0 ? qy : 0, oz = qz > 0 ? qz : 0;
  float outside = std::sqrt(ox * ox + oy * oy + oz * oz);
  float inside = std::fmin(std::fmax(qx, std::fmax(qy, qz)), 0.0f);
  return outside + inside;
}

inline float sd_torus_local(Vec3 q, float R, float r) {
  float ring = std::sqrt(q.x * q.x + q.z * q.z) - R;
  return std::sqrt(ring * ring + q.y * q.y) - r;
}

inline float sd_cylinder_local(Vec3 q, float r, float h) {
  float qx = std::sqrt(q.x * q.x + q.z * q.z) - r;
  float qy = std::fabs(q.y) - h;
  float ox = qx > 0 ? qx : 0, oy = qy > 0 ? qy : 0;
  return std::sqrt(ox * ox + oy * oy) + std::fmin(std::fmax(qx, qy), 0.0f);
}

inline float sd_capsule_local(Vec3 q, float r, float h) {
  float y = q.y - std::fmin(std::fmax(q.y, -h), h);
  return std::sqrt(q.x * q.x + y * y + q.z * q.z) - r;
}

inline float sd_cone_local(Vec3 p, float h, float r1, float r2) {
  // iq's exact capped cone: radius r1 at y=-h, r2 at y=+h.
  float qx = std::sqrt(p.x * p.x + p.z * p.z);
  float qy = p.y;
  float k2x = r2 - r1, k2y = 2.0f * h;
  float cax = qx - std::fmin(qx, qy < 0.0f ? r1 : r2);
  float cay = std::fabs(qy) - h;
  float denom = std::fmax(k2x * k2x + k2y * k2y, 1e-20f);
  float t = ((r2 - qx) * k2x + (h - qy) * k2y) / denom;
  t = std::fmin(std::fmax(t, 0.0f), 1.0f);
  float cbx = qx - r2 + k2x * t;
  float cby = qy - h + k2y * t;
  float s = (cbx < 0.0f && cay < 0.0f) ? -1.0f : 1.0f;
  return s * std::sqrt(std::fmin(cax * cax + cay * cay, cbx * cbx + cby * cby));
}

inline float smin(float a, float b, float k) {
  if (k < 1e-8f) k = 1e-8f;
  float h = k - std::fabs(a - b);
  if (h < 0) h = 0;
  h /= k;
  return std::fmin(a, b) - h * h * k * 0.25f;
}

inline float smax(float a, float b, float k) { return -smin(-a, -b, k); }

}  // namespace

extern "C" {

// Validate a wire tape. Returns number of commands, or a negative error:
//  -1 truncated stream / bad opcode, -2 stack underflow, -3 final stack != 1
//  (empty tape returns 0, the reference's "no scene" case).
// If out_max_depth is non-null, writes the maximum value-stack depth.
int64_t tape_validate(const uint32_t* tape, int64_t n_words,
                      int32_t* out_max_depth) {
  int64_t i = 0, cmds = 0;
  int depth = 0, max_depth = 0;
  while (i < n_words) {
    uint32_t op = tape[i++];
    int pc = param_count(op);
    if (pc < 0 || i + pc > n_words) return -1;
    i += pc;
    int d = stack_delta(op);
    if (d == -1 && depth < 2) return -2;
    if (d == 0 && depth < 1) return -2;
    depth += d;
    if (depth > max_depth) max_depth = depth;
    ++cmds;
  }
  if (cmds > 0 && depth != 1) return -3;
  if (out_max_depth) *out_max_depth = max_depth;
  return cmds;
}

// Evaluate the scene SDF for n_points points (xyz interleaved, f32[n*3]).
// Mirrors the WGSL interpreter (ray_marching.wgsl:187-252) + extensions.
// Returns 0 on success, negative on malformed tape. Empty tape writes
// `empty_value` (the caller passes cfg.max_dist, wgsl:188-191).
int32_t tape_eval(const uint32_t* tape, int64_t n_words, const float* points,
                  int64_t n_points, float empty_value, float* out) {
  if (n_words == 0) {
    for (int64_t p = 0; p < n_points; ++p) out[p] = empty_value;
    return 0;
  }
  if (tape_validate(tape, n_words, nullptr) < 0) return -1;

  std::vector<float> stack(64);
  for (int64_t pi = 0; pi < n_points; ++pi) {
    Vec3 p{points[3 * pi], points[3 * pi + 1], points[3 * pi + 2]};
    int sp = 0;
    int64_t i = 0;
    while (i < n_words) {
      uint32_t op = tape[i++];
      const float* par = reinterpret_cast<const float*>(tape + i);
      i += param_count(op);
      float v;
      switch (op) {
        case OP_SPHERE:
          v = sd_sphere(p, par, par[3]);
          break;
        case OP_BOX: {
          Vec3 q{p.x - par[0], p.y - par[1], p.z - par[2]};
          v = sd_box_local(q, par + 3);
          break;
        }
        case OP_BOX_ROT: {
          Vec3 q{p.x - par[4], p.y - par[5], p.z - par[6]};
          v = sd_box_local(rot_inv(par, q), par + 7);
          break;
        }
        case OP_PLANE:
          v = p.x * par[0] + p.y * par[1] + p.z * par[2] + par[3];
          break;
        case OP_TORUS: {
          Vec3 q{p.x - par[0], p.y - par[1], p.z - par[2]};
          v = sd_torus_local(q, par[3], par[4]);
          break;
        }
        case OP_TORUS_ROT: {
          Vec3 q{p.x - par[4], p.y - par[5], p.z - par[6]};
          v = sd_torus_local(rot_inv(par, q), par[7], par[8]);
          break;
        }
        case OP_CYLINDER: {
          Vec3 q{p.x - par[0], p.y - par[1], p.z - par[2]};
          v = sd_cylinder_local(q, par[3], par[4]);
          break;
        }
        case OP_CYLINDER_ROT: {
          Vec3 q{p.x - par[4], p.y - par[5], p.z - par[6]};
          v = sd_cylinder_local(rot_inv(par, q), par[7], par[8]);
          break;
        }
        case OP_CAPSULE: {
          Vec3 q{p.x - par[0], p.y - par[1], p.z - par[2]};
          v = sd_capsule_local(q, par[3], par[4]);
          break;
        }
        case OP_CAPSULE_ROT: {
          Vec3 q{p.x - par[4], p.y - par[5], p.z - par[6]};
          v = sd_capsule_local(rot_inv(par, q), par[7], par[8]);
          break;
        }
        case OP_CONE: {
          Vec3 q{p.x - par[0], p.y - par[1], p.z - par[2]};
          v = sd_cone_local(q, par[3], par[4], par[5]);
          break;
        }
        case OP_CONE_ROT: {
          Vec3 q{p.x - par[4], p.y - par[5], p.z - par[6]};
          v = sd_cone_local(rot_inv(par, q), par[7], par[8], par[9]);
          break;
        }
        case OP_UNION:
          --sp;
          v = std::fmin(stack[sp - 1], stack[sp]);
          break;
        case OP_SUBTRACTION:
          --sp;
          v = std::fmax(stack[sp - 1], -stack[sp]);
          break;
        case OP_INTERSECTION:
          --sp;
          v = std::fmax(stack[sp - 1], stack[sp]);
          break;
        case OP_SMOOTH_UNION:
          --sp;
          v = smin(stack[sp - 1], stack[sp], par[0]);
          break;
        case OP_SMOOTH_SUBTRACTION:
          --sp;
          v = smax(stack[sp - 1], -stack[sp], par[0]);
          break;
        case OP_SMOOTH_INTERSECTION:
          --sp;
          v = smax(stack[sp - 1], stack[sp], par[0]);
          break;
        case OP_ROUND:
          v = stack[sp - 1] - par[0];
          break;
        case OP_ONION:
          v = std::fabs(stack[sp - 1]) - par[0];
          break;
        case OP_MATERIAL:
          continue;  // attribute only; distances unaffected
        default:
          return -1;
      }
      if (op < 100) {
        if (sp >= static_cast<int>(stack.size())) stack.resize(stack.size() * 2);
        stack[sp++] = v;
      } else {
        stack[sp - 1] = v;
      }
    }
    out[pi] = stack[0];
  }
  return 0;
}

// Sphere-trace rays (o, d interleaved f32[n*3] each) against a wire tape.
// Semantics of the reference march loop (wgsl:87-115). Writes t[n] and
// hit[n] (0/1). Returns 0, or negative on malformed tape.
int32_t tape_march(const uint32_t* tape, int64_t n_words, const float* origins,
                   const float* dirs, int64_t n_rays, float min_dist,
                   float max_dist, int32_t max_iter, float* out_t,
                   uint8_t* out_hit) {
  if (n_words > 0 && tape_validate(tape, n_words, nullptr) < 0) return -1;
  for (int64_t r = 0; r < n_rays; ++r) {
    float t = 0.0f;
    uint8_t hit = 0;
    float p[3];
    for (int32_t it = 0; it < max_iter; ++it) {
      p[0] = origins[3 * r] + dirs[3 * r] * t;
      p[1] = origins[3 * r + 1] + dirs[3 * r + 1] * t;
      p[2] = origins[3 * r + 2] + dirs[3 * r + 2] * t;
      float d;
      if (tape_eval(tape, n_words, p, 1, max_dist, &d) != 0) return -1;
      if (d < min_dist) {
        hit = 1;
        break;
      }
      if (d > max_dist) break;
      t += d;
    }
    out_t[r] = t;
    out_hit[r] = hit;
  }
  return 0;
}

// Build a postorder union-of-spheres tape natively (the large-procedural-
// scene fast path; n spheres => 2n-1 commands). `spheres` is f32[n*4]
// (cx,cy,cz,r). Returns number of u32 words written, or -1 if the output
// buffer (capacity `cap` words) is too small. Layout matches what the
// Python encoder produces for the same scene (left-leaning union chain).
int64_t tape_build_sphere_union(const float* spheres, int64_t n, uint32_t* out,
                                int64_t cap) {
  int64_t w = 0;
  auto push_u32 = [&](uint32_t v) -> bool {
    if (w >= cap) return false;
    out[w++] = v;
    return true;
  };
  auto push_f32 = [&](float f) -> bool {
    uint32_t bits;
    std::memcpy(&bits, &f, sizeof(bits));
    return push_u32(bits);
  };
  for (int64_t i = 0; i < n; ++i) {
    if (!push_u32(OP_SPHERE)) return -1;
    for (int k = 0; k < 4; ++k)
      if (!push_f32(spheres[4 * i + k])) return -1;
    if (i > 0 && !push_u32(OP_UNION)) return -1;
  }
  return w;
}

}  // extern "C"
