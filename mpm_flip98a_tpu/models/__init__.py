"""Material models and assembled MPM substep pipelines."""
