from . import (kmeans, aeclustering, aeclustering_oracle, fastcluster, dbscan,
               optics, pointcloud, tracker, tracker_oracle, pipeline)
