"""Pose-estimation core: backbone, ray featurizer, attention scorer, loss,
solver, trainer (the 6DGS identification module stack)."""
