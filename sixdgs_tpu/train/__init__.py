"""3DGS training: per-group Adam, jitted train step, host-event densification."""
