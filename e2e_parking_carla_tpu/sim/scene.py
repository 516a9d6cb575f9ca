"""Town04 parking-lot scene constants and episode sampling.

The 64-slot lot, its bounds, and the ego start-pose generators reproduce the
reference's map constants (data_generation/parking_position.py:4-157) and
static-NPC sampling semantics (data_generation/world.py:145-188): between
len/3 and len-1 vehicles parked in shuffled slots, the target slot always
free, every unoccupied slot a valid parking goal, NPC yaw drawn from {0, 180}
(world.py:15-18).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Lot bounds (reference parking_position.py:4-9)
X_MIN, X_MAX = 264.0, 304.0
Y_MIN, Y_MAX = -241.0, -178.0
BOUND = np.array([X_MIN, X_MAX, Y_MIN, Y_MAX], np.float32)

# Four rows of 16 slots (reference parking_position.py:30-102)
ROW_X = np.array([298.5, 290.9, 280.0, 272.5], np.float32)
SLOT_Y = np.array(
    [-235.73, -232.73, -229.53, -226.43, -223.43, -220.23, -217.23, -214.03,
     -210.73, -207.30, -204.23, -201.03, -198.03, -194.90, -191.53, -188.20],
    np.float32,
)
NUM_SLOTS = 64

SLOT_XY = np.stack(
    [np.repeat(ROW_X, 16), np.tile(SLOT_Y, 4)], axis=-1
).astype(np.float32)  # (64, 2), index = row*16 + col

# Eval tasks: 16 goals, '2-1','2-3',...,'3-15' -> indices 16,18,...,46
# (reference network_evaluator.py:194 start at 16, :244-247 +=2 per slot)
EVAL_GOAL_INDICES = np.arange(16, 48, 2, dtype=np.int32)
# Data-gen tasks start at 2-2 (index 17) and walk odd indices
# (reference data_generator.py:26, :161-166)
DATAGEN_GOAL_INDICES = np.arange(17, 48, 2, dtype=np.int32)

SLOT_IDS = [f"{row}-{col}" for row in (1, 2, 3, 4) for col in range(1, 17)]
EVAL_SLOT_IDS = [SLOT_IDS[i] for i in EVAL_GOAL_INDICES]  # '2-1','2-3',...

# Ego start pose (reference parking_position.py:106-117): in the aisle
# between rows 2 and 3, heading +-90, y swept around the goal.
EGO_START_X = 285.600006
EGO_START_Y0 = -243.729996
EGO_SWEEP_HALF_RANGE = 8.0  # start y in [goal_y - 8, goal_y + 8]

# Slots' long axis is world-x; parked vehicles face 0 or 180 deg.
SLOT_YAW_DEG = 180.0  # goal yaw as reported to the agent (network_evaluator.py:204)


def npc_yaw_choices():
    return np.array([np.pi, 0.0], np.float32)  # {180, 0} deg in rad


def sample_scene(key: jax.Array, target_idx) -> tuple:
    """Sample static NPCs, mirroring init_static_npc (world.py:145-188).

    Returns (npc_valid (64,) bool, npc_yaw_rad (64,) f32, goal_free (64,) bool).
    goal_free marks slots that count as parking goals (free slots + target).
    """
    k_count, k_perm, k_yaw = jax.random.split(key, 3)
    count = jax.random.randint(k_count, (), NUM_SLOTS // 3, NUM_SLOTS)  # [21, 63]
    perm = jax.random.permutation(k_perm, NUM_SLOTS)
    # rank of each slot in the shuffled order; first `count` become NPCs
    rank = jnp.zeros(NUM_SLOTS, jnp.int32).at[perm].set(jnp.arange(NUM_SLOTS, dtype=jnp.int32))
    occupied = rank < count
    occupied = occupied & (jnp.arange(NUM_SLOTS) != target_idx)  # target always free
    yaw = jax.random.choice(k_yaw, jnp.asarray(npc_yaw_choices()), (NUM_SLOTS,))
    return occupied, yaw, ~occupied


def datagen_start_pose(key: jax.Array, goal_y, lat_noise: float = 0.6,
                       yaw_noise_deg: float = 4.0, near_frac: float = 0.0):
    """Random start pose for data generation (parking_position.py:148-151):
    y ~ U[goal_y-8, goal_y+8], heading +90 if y < goal_y else -90.

    On top of the reference's sweep we jitter the lateral position and
    heading (the reference gets this diversity for free from its four human
    drivers; the scripted expert's feedback controllers absorb the jitter,
    and the demonstrations then cover the recovery behaviors the policy
    needs in closed loop).

    near_frac: probability of drawing y from the NEAR band U[goal_y-3,
    goal_y+3] instead of the full sweep. The tightest maneuvers start with
    |y-goal| ~ 1.6 m (no run-up to align): that band is 1/3 of the eval
    protocol's poses but only 20% of the uniform sweep mass (near_frac=0.5
    raises it to ~37%). 0 keeps the reference-faithful uniform sweep.

    Returns (x, y, yaw_rad).
    """
    k_y, k_x, k_yaw, k_near, k_yn = jax.random.split(key, 5)
    y = jax.random.uniform(k_y, (), minval=goal_y - EGO_SWEEP_HALF_RANGE,
                           maxval=goal_y + EGO_SWEEP_HALF_RANGE)
    if near_frac > 0.0:
        y_near = jax.random.uniform(k_yn, (), minval=goal_y - 3.0,
                                    maxval=goal_y + 3.0)
        y = jnp.where(jax.random.bernoulli(k_near, near_frac), y_near, y)
    yaw = jnp.where(y < goal_y, jnp.pi / 2, -jnp.pi / 2)
    x = EGO_START_X + jax.random.uniform(k_x, (), minval=-lat_noise,
                                         maxval=lat_noise)
    yaw = yaw + jnp.radians(jax.random.uniform(
        k_yaw, (), minval=-yaw_noise_deg, maxval=yaw_noise_deg))
    return x.astype(jnp.float32), y, yaw


def eval_start_pose(goal_y, parking_idx, parking_nums: int):
    """Deterministic eval sweep (parking_position.py:135-157): y evenly swept
    over [goal_y-8, goal_y+8]; heading +90 for the first half of attempts,
    -90 for the second half. All jnp so it vmaps over (goal_y, parking_idx).
    """
    parking_idx = jnp.asarray(parking_idx)
    y_min = goal_y - EGO_SWEEP_HALF_RANGE
    y_max = goal_y + EGO_SWEEP_HALF_RANGE
    if parking_nums > 1:
        step = (y_max - y_min) / (parking_nums - 1)
        y = y_min + step * parking_idx.astype(jnp.float32)
    else:
        y = goal_y
    yaw = jnp.where(parking_idx < parking_nums / 2, jnp.pi / 2, -jnp.pi / 2)
    return jnp.float32(EGO_START_X), y, yaw


def is_out_of_bound(x, y):
    """Outside the lot rectangle (network_evaluator.py:169-182 semantics)."""
    return (x < X_MIN) | (x > X_MAX) | (y < Y_MIN) | (y > Y_MAX)
