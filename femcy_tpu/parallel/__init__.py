from femcy_tpu.parallel.sharded import (
    ShardedLinearSolver,
    ShardedNewtonStep,
    build_sharded_operands,
)

__all__ = ["ShardedLinearSolver", "ShardedNewtonStep", "build_sharded_operands"]
