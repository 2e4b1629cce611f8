// Store-and-forward queue-network oracle.
//
// An INDEPENDENT C++ implementation of the signalized-network dynamics in
// deeprl_network_tpu/envs/network.py (TrafficNetworkEnv.step), used to
// cross-validate the XLA program against a second implementation of the
// same spec, and as a fast host-side engine for reference-style
// single-env baselines (bench.py) without JAX dispatch overhead.
//
// Reference lineage: the dynamics replace the external SUMO microsim +
// envs/atsc_env.py TrafficSimulator.step of cts198859/deeprl_network
// (SURVEY.md section 2.2 item 6, call stack 3.1) with per-movement queues,
// phase-gated saturation discharge, static turn-matrix routing, expected-
// space spillback, yellow windows on phase switches, and head-vehicle
// waiting clocks. Semantics must stay bit-compatible (up to float
// reassociation) with network.py — tests/test_native_oracle.py enforces
// this on every topology.
//
// Build: g++ -O2 -shared -fPIC -o libsfq_oracle.so sfq_oracle.cpp
// (done automatically by deeprl_network_tpu/envs/native_oracle.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline float fmin3(float a, float b, float c) {
  return std::min(a, std::min(b, c));
}

}  // namespace

extern "C" {

// Advance `n_steps` control intervals. State arrays (queue, wait,
// prev_phase, t, dropped) are updated in place; per-step node aggregates
// and diagnostics are written to the *_out arrays.
//
// Shapes (row-major):
//   phase_gate     [M, P, L]   {0,1} discharge gates per node phase
//   n_valid        [M]         number of valid phases per node
//   route          [L, L]      turn fractions, rows sum <= 1
//   entry          [L]         {0,1} entry-lane indicator
//   demand         [Td, L]     veh/s external arrivals per control step
//   node_lane_mask [M, L]      {0,1} lane ownership
//   actions        [n_steps, M]
//   node_queue_out / node_wait_out  [n_steps, M]
//   flow_out       [n_steps]   total discharged vehicles
//   done_out       [n_steps]   {0,1}
void sfq_rollout(
    int L, int M, int P,
    const float* phase_gate,
    const int32_t* n_valid,
    const float* route,
    const float* entry,
    const float* demand,
    int Td,
    const float* node_lane_mask,
    float cap, float sat_flow,
    int control_interval, int yellow_interval, int episode_steps,
    float* queue, float* wait, int32_t* prev_phase, int32_t* t_io,
    float* dropped_io,
    const int32_t* actions,
    int n_steps,
    float* node_queue_out,
    float* node_wait_out,
    float* flow_out,
    uint8_t* done_out) {
  std::vector<float> route_out(L, 0.0f);   // row sums of the turn matrix
  for (int l = 0; l < L; ++l) {
    float s = 0.0f;
    for (int j = 0; j < L; ++j) s += route[l * L + j];
    route_out[l] = s;
  }

  std::vector<int32_t> act(M);
  std::vector<float> lane_gate(L), lane_switch(L);
  std::vector<float> space(L), dq(L), arrivals(L);

  int32_t t = *t_io;
  float dropped = *dropped_io;

  for (int s = 0; s < n_steps; ++s) {
    const int32_t* a_row = actions + (size_t)s * M;
    // clamp padded/invalid phase indices (network.py: clip to n_valid-1)
    for (int m = 0; m < M; ++m) {
      int32_t a = a_row[m];
      if (a < 0) a = 0;
      if (a > n_valid[m] - 1) a = n_valid[m] - 1;
      act[m] = a;
    }
    // chosen-phase green gate per lane, and switched-node lane mask
    std::fill(lane_gate.begin(), lane_gate.end(), 0.0f);
    std::fill(lane_switch.begin(), lane_switch.end(), 0.0f);
    for (int m = 0; m < M; ++m) {
      const float* g = phase_gate + ((size_t)m * P + act[m]) * L;
      for (int l = 0; l < L; ++l) lane_gate[l] += g[l];
      if (act[m] != prev_phase[m]) {
        const float* nm = node_lane_mask + (size_t)m * L;
        for (int l = 0; l < L; ++l) lane_switch[l] += nm[l];
      }
    }
    int td = t < Td - 1 ? t : Td - 1;
    const float* demand_t = demand + (size_t)td * L;

    float flow_sum = 0.0f;
    for (int k = 0; k < control_interval; ++k) {
      float yellow = k < yellow_interval ? 1.0f : 0.0f;
      // expected downstream space, normalized by total turn fraction;
      // pure-exit lanes are never blocked
      for (int l = 0; l < L; ++l) {
        float sp = 0.0f;
        const float* r = route + (size_t)l * L;
        for (int j = 0; j < L; ++j) {
          float free_j = cap - queue[j];
          if (free_j > 0.0f) sp += r[j] * free_j;
        }
        float ro = route_out[l];
        space[l] = ro > 1e-6f ? sp / std::max(ro, 1e-6f) : cap;
        float g = lane_gate[l] * (1.0f - yellow * lane_switch[l]);
        dq[l] = fmin3(queue[l], g * sat_flow, space[l]);
        flow_sum += dq[l];
      }
      // routing: arrivals = route^T @ dq
      std::fill(arrivals.begin(), arrivals.end(), 0.0f);
      for (int l = 0; l < L; ++l) {
        float d = dq[l];
        if (d == 0.0f) continue;
        const float* r = route + (size_t)l * L;
        for (int j = 0; j < L; ++j) arrivals[j] += r[j] * d;
      }
      for (int l = 0; l < L; ++l) {
        float q2 = queue[l] + arrivals[l] - dq[l];
        // cross-upstream overshoot past capacity is counted in dropped
        // (mirrors envs/network.py substep exactly)
        float overflow = std::max(q2 - cap, 0.0f);
        q2 -= overflow;
        float inflow = demand_t[l] * entry[l];
        float free = std::max(cap - q2, 0.0f);
        float accepted = std::min(inflow, free);
        q2 = q2 + accepted;
        dropped += inflow - accepted + overflow;
        float served = dq[l] > 1e-4f ? 1.0f : 0.0f;
        float nonempty = q2 > 0.1f ? 1.0f : 0.0f;
        wait[l] = (wait[l] + 1.0f) * nonempty * (1.0f - served);
        queue[l] = q2;
      }
    }

    t += 1;
    for (int m = 0; m < M; ++m) prev_phase[m] = act[m];
    float* nq = node_queue_out + (size_t)s * M;
    float* nw = node_wait_out + (size_t)s * M;
    for (int m = 0; m < M; ++m) {
      const float* nm = node_lane_mask + (size_t)m * L;
      float q_acc = 0.0f, w_acc = 0.0f;
      for (int l = 0; l < L; ++l) {
        q_acc += nm[l] * queue[l];
        w_acc += nm[l] * wait[l];
      }
      nq[m] = q_acc;
      nw[m] = w_acc;
    }
    flow_out[s] = flow_sum;
    done_out[s] = t >= episode_steps ? 1 : 0;
  }

  *t_io = t;
  *dropped_io = dropped;
}

}  // extern "C"
