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
// link travel times (vehicles routed onto a link take lane_delay[l]
// seconds before joining its stop-line queue — a [D, L] ring buffer),
// phase-gated saturation discharge, static turn-matrix routing, expected-
// space spillback over queued + in-transit occupancy, yellow windows on
// phase switches, and head-vehicle waiting clocks. Semantics must stay
// bit-compatible (up to float reassociation) with network.py —
// tests/test_native_oracle.py enforces this on every topology.
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

// Advance `n_steps` control intervals. State arrays (queue, transit,
// head, wait, prev_phase, t, dropped) are updated in place; per-step node
// aggregates and diagnostics are written to the *_out arrays.
//
// Shapes (row-major):
//   phase_gate     [M, P, L]   {0,1} discharge gates per node phase
//   n_valid        [M]         number of valid phases per node
//   route          [L, L]      turn fractions, rows sum <= 1
//   entry          [L]         {0,1} entry-lane indicator
//   demand         [Td, L]     veh/s external arrivals per control step
//   node_lane_mask [M, L]      {0,1} lane ownership
//   lane_delay     [L]         link travel seconds per lane, in [1, D]
//   transit        [D, L]      in-transit ring buffer; row `head` holds
//                              the vehicles arriving this second
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
    const int32_t* lane_delay,
    int D,
    float cap, float sat_flow,
    int control_interval, int yellow_interval, int episode_steps,
    float* queue, float* transit, int32_t* head_io,
    float* wait, int32_t* prev_phase, int32_t* t_io,
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
  std::vector<float> space(L), dq(L), routed(L), tsum(L);

  int32_t t = *t_io;
  int32_t head = *head_io;
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
      // vehicles finishing link traversal join the stop-line queue;
      // overshoot past capacity is counted in dropped (mirrors
      // envs/network.py substep exactly)
      float* arr = transit + (size_t)head * L;
      for (int l = 0; l < L; ++l) {
        float q = queue[l] + arr[l];
        arr[l] = 0.0f;
        float overflow = std::max(q - cap, 0.0f);
        dropped += overflow;
        queue[l] = q - overflow;
      }
      head = (head + 1) % D;
      // in-transit occupancy per lane (consumed row is zero)
      for (int l = 0; l < L; ++l) tsum[l] = 0.0f;
      for (int d = 0; d < D; ++d) {
        const float* row = transit + (size_t)d * L;
        for (int l = 0; l < L; ++l) tsum[l] += row[l];
      }
      float yellow = k < yellow_interval ? 1.0f : 0.0f;
      // expected downstream space over queued + in-transit occupancy,
      // normalized by total turn fraction; pure-exit lanes never block
      for (int l = 0; l < L; ++l) {
        float sp = 0.0f;
        const float* r = route + (size_t)l * L;
        for (int j = 0; j < L; ++j) {
          float free_j = cap - (queue[j] + tsum[j]);
          if (free_j > 0.0f) sp += r[j] * free_j;
        }
        float ro = route_out[l];
        space[l] = ro > 1e-6f ? sp / std::max(ro, 1e-6f) : cap;
        float g = lane_gate[l] * (1.0f - yellow * lane_switch[l]);
        dq[l] = fmin3(queue[l], g * sat_flow, space[l]);
        flow_sum += dq[l];
      }
      // routing: routed = route^T @ dq, entering the downstream link
      std::fill(routed.begin(), routed.end(), 0.0f);
      for (int l = 0; l < L; ++l) {
        float d = dq[l];
        if (d == 0.0f) continue;
        const float* r = route + (size_t)l * L;
        for (int j = 0; j < L; ++j) routed[j] += r[j] * d;
      }
      for (int l = 0; l < L; ++l) {
        float q2 = queue[l] - dq[l];
        // push routed vehicles: arrive after lane_delay[l] substeps
        int slot = (head + lane_delay[l] - 1) % D;
        transit[(size_t)slot * L + l] += routed[l];
        // entry demand enters its boundary link, same travel delay
        float inflow = demand_t[l] * entry[l];
        float free = std::max(cap - (q2 + tsum[l] + routed[l]), 0.0f);
        float accepted = std::min(inflow, free);
        transit[(size_t)slot * L + l] += accepted;
        dropped += inflow - accepted;
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
  *head_io = head;
  *dropped_io = dropped;
}

}  // extern "C"
