from . import sh, quaternion, covariance, camera, schedules, knn  # noqa: F401
