"""Scene builders: the reference workloads + the BASELINE.json configs.

- `dam_break_2d`  — the reference's production scene: a 65 x 130 particle
  lattice filling a 0.057 x 0.114 m fluid column against the left wall of a
  0.4375 m box (reference: config.py:30-35), 105^2 grid with 4 padding
  cells (config.py:37-39).
- `elastic_drop_2d` — mixed-material scene: a neo-Hookean block dropped
  into the fluid column (BASELINE.json configs[2]).
- `dam_break_3d`  — 3D free-surface column (BASELINE.json configs[3]).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from mpm_flip98a_tpu.config import MPMConfig, Physics
from mpm_flip98a_tpu.models import materials as mat
from mpm_flip98a_tpu.models.stabilized import PAD, Scene, WallBC
from mpm_flip98a_tpu.state import Particles


def _lattice(counts, origin, size, dtype):
    """counts particles per axis, cell-centered in a box [origin, origin+size)."""
    axes = [
        (np.arange(c, dtype=np.float64) + 0.5) * (s / c) + o
        for c, s, o in zip(counts, size, origin)
    ]
    grids = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1).astype(dtype)


def _floor_of(p) -> float:
    """Absolute grid-mass floor for the scene: 1e-8 x the lightest
    particle (see stabilized.Scene.mass_floor — shard-invariant)."""
    import numpy as _np
    return 1e-8 * float(_np.min(_np.asarray(p.mass)))


def dam_break_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
) -> Tuple[Particles, Scene]:
    """The reference production scene (config.py:30-35): fluid column at the
    left wall; particle mass/volume from the lattice (config.py:36)."""
    cfg = cfg or MPMConfig(dtype=np.dtype(dtype).name)
    x = _lattice(
        (cfg.num_particles_x, cfg.num_particles_y),
        (0.0, 0.0),
        (cfg.fluid_width, cfg.fluid_height),
        dtype,
    )
    p = Particles.init(
        jnp.asarray(x),
        volume0=cfg.initial_particle_volume,
        density=physics.particle_density,
    )
    scene = Scene(cfg=cfg, physics=physics, params=mat.MaterialParams(
        bulk_modulus=physics.bulk_modulus,
        dynamic_viscosity=physics.dynamic_viscosity,
    ), mass_floor=_floor_of(p))
    return p, scene


def elastic_drop_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
    block_frac: float = 0.12,
    drop_height_frac: float = 0.55,
    block_material: int = mat.NEO_HOOKEAN,
    plastic: bool = False,
) -> Tuple[Particles, Scene]:
    """Neo-Hookean elastic block dropped into the fluid column
    (BASELINE.json configs[2] 'multi-material scene')."""
    cfg = cfg or MPMConfig(dtype=np.dtype(dtype).name)
    fluid_x = _lattice(
        (cfg.num_particles_x, cfg.num_particles_y),
        (0.0, 0.0),
        (cfg.fluid_width, cfg.fluid_height),
        dtype,
    )
    l = cfg.domain_length
    side = block_frac * l
    nb = max(8, int(side / (cfg.fluid_width / cfg.num_particles_x)))
    block_x = _lattice(
        (nb, nb),
        (0.45 * l, drop_height_frac * l),
        (side, side),
        dtype,
    )
    x = np.concatenate([fluid_x, block_x], axis=0)
    material = np.concatenate(
        [
            np.full(len(fluid_x), mat.WEAKLY_COMPRESSIBLE_FLUID, np.int32),
            np.full(len(block_x), block_material, np.int32),
        ]
    )
    vol_f = cfg.initial_particle_volume
    vol_b = (side * side) / len(block_x)
    volume0 = np.concatenate(
        [np.full(len(fluid_x), vol_f), np.full(len(block_x), vol_b)]
    ).astype(dtype)
    rho_block = 400.0  # light elastic block (floats)
    density = np.concatenate(
        [
            np.full(len(fluid_x), physics.particle_density),
            np.full(len(block_x), rho_block),
        ]
    ).astype(dtype)
    p = Particles.init(
        jnp.asarray(x),
        volume0=jnp.asarray(volume0),
        density=jnp.asarray(density),
        material=jnp.asarray(material),
    )
    # Soft elastic block: E = 5e4 Pa, nu = 0.3.
    e_block, nu_block = 5e4, 0.3
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            bulk_modulus=physics.bulk_modulus,
            dynamic_viscosity=physics.dynamic_viscosity,
            mu=e_block / (2 * (1 + nu_block)),
            lam=e_block * nu_block / ((1 + nu_block) * (1 - 2 * nu_block)),
            plastic=plastic,
        ),
        materials_present=(mat.WEAKLY_COMPRESSIBLE_FLUID, block_material),
        mass_floor=_floor_of(p),
    )
    return p, scene


def snow_block_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
    block_frac: float = 0.18,
    drop_height_frac: float = 0.5,
    particles_per_axis: int = 40,
    youngs: float = 1.4e5,
    poisson: float = 0.2,
) -> Tuple[Particles, Scene]:
    """Snow block dropped onto the floor: the PRODUCTION snow material
    (materials.SNOW) — fixed corotated with hardening-scaled Lame
    parameters driven by the tracked plastic volume Jp, singular-value
    clamp at F-update time (reference validation solver:
    mls-mpm88-explained.cpp:17-19,67-69,164-177; E/nu defaults are the
    classic Stomakhin et al. 2013 snow values).  The block compacts
    plastically on impact instead of bouncing elastically."""
    cfg = cfg or MPMConfig(dtype=np.dtype(dtype).name)
    l = cfg.domain_length
    side = block_frac * l
    n = particles_per_axis
    x = _lattice((n, n), (0.5 * (l - side), drop_height_frac * l), (side, side), dtype)
    rho_snow = 400.0
    p = Particles.init(
        jnp.asarray(x),
        volume0=side * side / (n * n),
        density=rho_snow,
        material=jnp.full((len(x),), mat.SNOW, jnp.int32),
    )
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            mu=youngs / (2 * (1 + poisson)),
            lam=youngs * poisson / ((1 + poisson) * (1 - 2 * poisson)),
        ),
        materials_present=(mat.SNOW,),
        mass_floor=_floor_of(p),
    )
    return p, scene


def dam_break_obstacle_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
    sticky: bool = False,
    center_frac: Tuple[float, float] = (0.55, 0.10),
    radius_frac: float = 0.08,
) -> Tuple[Particles, Scene]:
    """Dam break over a rigid sphere obstacle (collider extension,
    models/colliders.py): the collapsing column hits a cylinder standing
    in the run-out path and splits around it.  Grid-velocity collision —
    the classic MPM rigid-obstacle treatment the reference's box-only
    walls cannot express."""
    import dataclasses as _dc

    p, scene = dam_break_2d(cfg, physics=physics, dtype=dtype)
    from mpm_flip98a_tpu.models.colliders import Collider

    l = scene.cfg.domain_length
    sphere = Collider(
        kind="sphere",
        center=(center_frac[0] * l, center_frac[1] * l),
        radius=radius_frac * l,
        sticky=sticky,
    )
    return p, _dc.replace(scene, colliders=(sphere,))


def plow_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
    speed_frac: float = 0.25,
    sticky: bool = True,
) -> Tuple[Particles, Scene]:
    """Kinematic-collider demo (models/colliders.py): a rigid cylinder
    sweeps horizontally through the settling pool at constant velocity
    (center_velocity), plowing material ahead of it — the moving-obstacle
    BC the reference's static box walls cannot express.  speed_frac is
    the plow speed as a fraction of domain_length per second."""
    import dataclasses as _dc

    p, scene = dam_break_2d(cfg, physics=physics, dtype=dtype)
    from mpm_flip98a_tpu.models.colliders import Collider

    l = scene.cfg.domain_length
    plow = Collider(
        kind="sphere",
        center=(0.80 * l, 0.10 * l),
        radius=0.08 * l,
        sticky=sticky,
        center_velocity=(-speed_frac * l, 0.0),
    )
    return p, _dc.replace(scene, colliders=(plow,))


def sand_column_2d(
    cfg: Optional[MPMConfig] = None,
    physics: Physics = Physics(),
    dtype=np.float64,
    width_frac: float = 0.14,
    height_frac: float = 0.38,
    particles_per_axis: Tuple[int, int] = (28, 76),
    youngs: float = 3.537e5,
    poisson: float = 0.3,
    friction_angle: float = 35.0,
) -> Tuple[Particles, Scene]:
    """Sand column collapse: the Drucker-Prager SAND material (extension
    beyond the reference's material set; Klar et al. 2016 §8 column test,
    with their quartz-sand parameters E = 3.537e5 Pa, nu = 0.3,
    phi = 35 degrees, rho = 2200 kg/m^3).  A column standing on the floor
    loses its footing under gravity and flows out into a pile whose slope
    is set by the friction angle — qualitatively unreachable for the
    fluid (spreads flat) or the elastic solids (bounce/stand)."""
    cfg = cfg or MPMConfig(dtype=np.dtype(dtype).name)
    l = cfg.domain_length
    w = width_frac * l
    h = height_frac * l
    floor_y = (PAD + 0.55) * cfg.dx  # just above the wall band
    nx, ny = particles_per_axis
    x = _lattice((nx, ny), (0.5 * (l - w), floor_y), (w, h), dtype)
    rho_sand = 2200.0
    p = Particles.init(
        jnp.asarray(x),
        volume0=w * h / (nx * ny),
        density=rho_sand,
        material=jnp.full((len(x),), mat.SAND, jnp.int32),
    )
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            mu=youngs / (2 * (1 + poisson)),
            lam=youngs * poisson / ((1 + poisson) * (1 - 2 * poisson)),
            friction_angle=friction_angle,
        ),
        materials_present=(mat.SAND,),
        mass_floor=_floor_of(p),
    )
    return p, scene


def slab_3d(
    num_grids: int = 128,
    particles_per_axis: Tuple[int, int, int] = (256, 256, 16),
    height_frac: float = 0.125,
    physics: Physics = Physics(),
    dtype=np.float32,
    dt: float = 5e-6,
    flip_blend: float = 0.98,
) -> Tuple[Particles, Scene]:
    """3D fluid slab covering the whole floor — the load-balanced 3D
    benchmark workload (even particles-per-pencil occupancy for the
    pencil-bucketed fast path; BASELINE.json configs[3] scaled by the
    caller: 256^3 / 8M particles = num_grids=256, (512, 512, 32))."""
    from mpm_flip98a_tpu.config import TransferKind

    cfg = MPMConfig(
        dim=3,
        dtype=np.dtype(dtype).name,
        num_grids=num_grids,
        dt=dt,
        flip_blend=flip_blend,
        transfer=TransferKind.PIC if flip_blend > 0 else TransferKind.APIC,
    )
    l = cfg.domain_length
    size = (0.98 * l, 0.98 * l, height_frac * l)
    x = _lattice(particles_per_axis, (0.0, 0.0, 0.0), size, dtype)
    vol = size[0] * size[1] * size[2] / len(x)
    p = Particles.init(
        jnp.asarray(x), volume0=vol, density=physics.particle_density
    )
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            bulk_modulus=physics.bulk_modulus,
            dynamic_viscosity=physics.dynamic_viscosity,
        ),
        wall=WallBC("slip"),
        mass_floor=_floor_of(p),
    )
    return p, scene


def elastic_drop_3d(
    num_grids: int = 16,
    fluid_particles: Tuple[int, int, int] = (8, 8, 4),
    block_particles: Tuple[int, int, int] = (4, 4, 4),
    physics: Physics = Physics(),
    dtype=np.float32,
    dt: float = 2e-5,
    block_material: int = mat.NEO_HOOKEAN,
    plastic: bool = False,
    **cfg_kwargs,
) -> Tuple[Particles, Scene]:
    """3D mixed-material scene: an elastic block dropped onto a fluid slab
    (the 3D analogue of elastic_drop_2d / BASELINE.json configs[2])."""
    cfg = MPMConfig(
        dim=3, dtype=np.dtype(dtype).name, num_grids=num_grids, dt=dt,
        **cfg_kwargs,
    )
    l = cfg.domain_length
    fsize = (0.9 * l, 0.9 * l, 0.25 * l)
    fluid_x = _lattice(fluid_particles, (0.0, 0.0, 0.0), fsize, dtype)
    side = 0.2 * l
    block_x = _lattice(
        block_particles, (0.4 * l, 0.4 * l, 0.55 * l), (side,) * 3, dtype
    )
    x = np.concatenate([fluid_x, block_x], axis=0)
    material = np.concatenate(
        [
            np.full(len(fluid_x), mat.WEAKLY_COMPRESSIBLE_FLUID, np.int32),
            np.full(len(block_x), block_material, np.int32),
        ]
    )
    vol_f = fsize[0] * fsize[1] * fsize[2] / len(fluid_x)
    vol_b = side**3 / len(block_x)
    volume0 = np.concatenate(
        [np.full(len(fluid_x), vol_f), np.full(len(block_x), vol_b)]
    ).astype(dtype)
    density = np.concatenate(
        [
            np.full(len(fluid_x), physics.particle_density),
            np.full(len(block_x), 400.0),
        ]
    ).astype(dtype)
    p = Particles.init(
        jnp.asarray(x),
        volume0=jnp.asarray(volume0),
        density=jnp.asarray(density),
        material=jnp.asarray(material),
    )
    e_block, nu_block = 5e4, 0.3
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            bulk_modulus=physics.bulk_modulus,
            dynamic_viscosity=physics.dynamic_viscosity,
            mu=e_block / (2 * (1 + nu_block)),
            lam=e_block * nu_block / ((1 + nu_block) * (1 - 2 * nu_block)),
            plastic=plastic,
        ),
        materials_present=(mat.WEAKLY_COMPRESSIBLE_FLUID, block_material),
        wall=WallBC("slip"),
        mass_floor=_floor_of(p),
    )
    return p, scene


def dam_break_obstacle_3d(
    num_grids: int = 64,
    particles_per_axis: Tuple[int, int, int] = (24, 24, 48),
    physics: Physics = Physics(),
    dtype=np.float32,
    dt: float = 1e-5,
    center_frac: Tuple[float, float, float] = (0.55, 0.50, 0.12),
    radius_frac: float = 0.10,
    **cfg_kwargs,
) -> Tuple[Particles, Scene]:
    """3D dam break around a rigid sphere (collider extension): the
    collapsing column's run-out splits around an obstacle standing in
    its path (models/colliders.py)."""
    import dataclasses as _dc

    p, scene = dam_break_3d(
        num_grids, particles_per_axis, physics, dtype, dt, **cfg_kwargs
    )
    from mpm_flip98a_tpu.models.colliders import Collider

    l = scene.cfg.domain_length
    sphere = Collider(
        kind="sphere",
        center=tuple(c * l for c in center_frac),
        radius=radius_frac * l,
    )
    return p, _dc.replace(scene, colliders=(sphere,))


def dam_break_3d(
    num_grids: int = 64,
    particles_per_axis: Tuple[int, int, int] = (24, 24, 48),
    physics: Physics = Physics(),
    dtype=np.float32,
    dt: float = 1e-5,
    **cfg_kwargs,
) -> Tuple[Particles, Scene]:
    """3D free-surface column collapse (BASELINE.json configs[3] scaled by
    the caller: 256^3 grid / 8M particles uses the same builder).  Extra
    kwargs go to MPMConfig (switch-matrix variants in tests)."""
    cfg = MPMConfig(
        dim=3,
        dtype=np.dtype(dtype).name,
        num_grids=num_grids,
        dt=dt,
        **cfg_kwargs,
    )
    # Column tall along the LAST axis — gravity acts on it
    # (MPMConfig.gravity_acceleration).
    l = cfg.domain_length
    w = 0.25 * l
    h = 0.5 * l
    x = _lattice(particles_per_axis, (0.0, 0.0, 0.0), (w, w, h), dtype)
    vol = (w * h * w) / len(x)
    p = Particles.init(
        jnp.asarray(x), volume0=vol, density=physics.particle_density
    )
    scene = Scene(
        cfg=cfg,
        physics=physics,
        params=mat.MaterialParams(
            bulk_modulus=physics.bulk_modulus,
            dynamic_viscosity=physics.dynamic_viscosity,
        ),
        wall=WallBC("slip"),
        mass_floor=_floor_of(p),
    )
    return p, scene
