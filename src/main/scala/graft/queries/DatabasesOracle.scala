package graft.queries

/** DuckDB oracle for `ontology_materialize_databases`: the 21 provider
  * arms with coalesce chains pre-resolved (public → private endpoint
  * fallback; extras missing from the frame degrade the chain to its
  * primary), static type stamps, and the (priority, src id) winner rule. */
private[queries] object DatabasesOracle {
  val sql: String =
    """WITH src AS (
      |  SELECT 'db-' || CAST(c_custkey % 500 AS VARCHAR) AS name,
      |         CASE c_custkey % 3 WHEN 0 THEN 'postgres' WHEN 1 THEN 'mysql'
      |           ELSE 'aurora' END AS type,
      |         'rds-' || CAST(c_custkey AS VARCHAR) || '.ex' AS endpoint,
      |         CAST(5432 + c_custkey % 3 AS BIGINT) AS port,
      |         c_custkey % 2 = 0 AS encrypted,
      |         0 AS prio, 'rds' || CAST(c_custkey AS VARCHAR) AS sid,
      |         'AWSRDSInstance' AS lbl FROM customer
      |  UNION ALL
      |  SELECT 'db-' || CAST(r_regionkey + 2 AS VARCHAR), 'es',
      |         'es-' || CAST(r_regionkey AS VARCHAR) || '.ex',
      |         CAST(NULL AS BIGINT), r_regionkey % 2 = 1,
      |         1, 'es' || CAST(r_regionkey AS VARCHAR), 'AWSESDomain' FROM region
      |  UNION ALL
      |  SELECT 'db-' || CAST(n_nationkey AS VARCHAR), 'dynamodb', NULL,
      |         NULL, NULL,
      |         2, 'dyn' || CAST(n_nationkey AS VARCHAR), 'AWSDynamoDBTable' FROM nation
      |  UNION ALL
      |  SELECT 'db-' || CAST(s_suppkey % 400 AS VARCHAR),
      |         CASE s_suppkey % 2 WHEN 0 THEN 'v12.0,user' ELSE 'GP_Gen5' END,
      |         NULL, NULL, NULL,
      |         10, 'asql' || CAST(s_suppkey AS VARCHAR), 'AzureSQLDatabase' FROM supplier
      |  UNION ALL
      |  SELECT 'db-' || CAST(r_regionkey + 1 AS VARCHAR), 'cosmosdb-sql',
      |         NULL, NULL, NULL,
      |         11, 'acs' || CAST(r_regionkey AS VARCHAR),
      |         'AzureCosmosDBSqlDatabase' FROM region
      |  UNION ALL
      |  SELECT 'db-' || CAST(r_regionkey + 3 AS VARCHAR), 'cosmosdb-mongodb',
      |         NULL, NULL, NULL,
      |         12, 'acm' || CAST(r_regionkey AS VARCHAR),
      |         'AzureCosmosDBMongoDBDatabase' FROM region
      |  UNION ALL
      |  SELECT 'db-' || CAST(n_nationkey + 5 AS VARCHAR), 'cosmosdb-cassandra',
      |         NULL, NULL, NULL,
      |         13, 'acc' || CAST(n_nationkey AS VARCHAR),
      |         'AzureCosmosDBCassandraKeyspace' FROM nation
      |  UNION ALL
      |  SELECT 'db-' || CAST(r_regionkey + 4 AS VARCHAR), 'bigtable',
      |         NULL, NULL, NULL,
      |         20, 'bt' || CAST(r_regionkey AS VARCHAR),
      |         'GCPBigtableInstance' FROM region
      |  UNION ALL
      |  SELECT 'db-' || CAST(n_nationkey + 1 AS VARCHAR),
      |         CASE n_nationkey % 2 WHEN 0 THEN 'POSTGRES_15' ELSE 'MYSQL_8' END,
      |         NULL, NULL, NULL,
      |         21, 'csql' || CAST(n_nationkey AS VARCHAR),
      |         'GCPCloudSQLInstance' FROM nation
      |  UNION ALL
      |  SELECT 'db-' || CAST(n_nationkey + 2 AS VARCHAR), 'bigquery',
      |         NULL, NULL, NULL,
      |         22, 'bq' || CAST(n_nationkey AS VARCHAR),
      |         'GCPBigQueryDataset' FROM nation
      |  UNION ALL
      |  SELECT 'db-' || CAST(n_nationkey + 3 AS VARCHAR),
      |         CASE n_nationkey % 2 WHEN 0 THEN 'PostgreSQL-15' ELSE 'MySQL-8' END,
      |         CASE WHEN n_nationkey % 3 = 0
      |           THEN '192.168.0.' || CAST(n_nationkey AS VARCHAR)
      |           ELSE 'rdb-' || CAST(n_nationkey AS VARCHAR) || '.ex' END,
      |         CAST(CASE WHEN n_nationkey % 2 = 0 THEN 54320 + n_nationkey
      |           ELSE 5432 END AS BIGINT),
      |         n_nationkey % 2 = 1,
      |         30, 'rdb' || CAST(n_nationkey AS VARCHAR),
      |         'ScalewayRdbInstance' FROM nation
      |  UNION ALL
      |  SELECT 'db-r-' || CAST(r_regionkey AS VARCHAR), 'redis',
      |         CASE WHEN r_regionkey % 2 = 0
      |           THEN '172.16.0.' || CAST(r_regionkey AS VARCHAR)
      |           ELSE '163.0.0.' || CAST(r_regionkey AS VARCHAR) END,
      |         CAST(CASE WHEN r_regionkey % 2 = 1 THEN NULL ELSE 6379 END AS BIGINT),
      |         NULL,
      |         31, 'red' || CAST(r_regionkey AS VARCHAR),
      |         'ScalewayRedisCluster' FROM region
      |  UNION ALL
      |  SELECT 'db-m-' || CAST(r_regionkey AS VARCHAR), 'mongodb',
      |         CASE WHEN r_regionkey % 3 = 0 THEN NULL
      |           ELSE 'mgo-' || CAST(r_regionkey AS VARCHAR) || '.ex' END,
      |         CAST(27017 AS BIGINT), NULL,
      |         32, 'mgo' || CAST(r_regionkey AS VARCHAR),
      |         'ScalewayMongoDBInstance' FROM region
      |  UNION ALL
      |  SELECT 'db-w-' || CAST(r_regionkey AS VARCHAR), 'clickhouse',
      |         NULL, NULL, NULL,
      |         33, 'dwh' || CAST(r_regionkey AS VARCHAR),
      |         'ScalewayDataWarehouseDeployment' FROM region
      |  UNION ALL
      |  SELECT 'db-s-' || CAST(r_regionkey AS VARCHAR), 'postgres',
      |         'sls-' || CAST(r_regionkey AS VARCHAR) || '.ex', NULL, NULL,
      |         34, 'sls' || CAST(r_regionkey AS VARCHAR),
      |         'ScalewayServerlessSQLDatabase' FROM region
      |  UNION ALL
      |  SELECT 'db-q-' || CAST(r_regionkey AS VARCHAR), 'opensearch',
      |         NULL, NULL, NULL,
      |         35, 'srch' || CAST(r_regionkey AS VARCHAR),
      |         'ScalewaySearchDeployment' FROM region
      |  UNION ALL
      |  SELECT 'db-c-' || CAST(n_nationkey AS VARCHAR),
      |         CASE n_nationkey % 2 WHEN 0 THEN 'MANAGED' ELSE 'DELTASHARING' END,
      |         NULL, NULL, NULL,
      |         40, 'cat' || CAST(n_nationkey AS VARCHAR),
      |         'DatabricksCatalog' FROM nation
      |  UNION ALL
      |  SELECT 'db-c-' || CAST(n_nationkey AS VARCHAR) || '.s', NULL,
      |         NULL, NULL, NULL,
      |         41, 'sch' || CAST(n_nationkey AS VARCHAR),
      |         'DatabricksSchema' FROM nation
      |  UNION ALL
      |  SELECT 'db-c-' || CAST(n_nationkey AS VARCHAR) || '.s.t', NULL,
      |         NULL, NULL, NULL,
      |         42, 'tbl' || CAST(n_nationkey AS VARCHAR),
      |         'DatabricksTable' FROM nation
      |  UNION ALL
      |  SELECT 'db-' || CAST(r_regionkey AS VARCHAR), 'postgres',
      |         'sup-' || CAST(r_regionkey AS VARCHAR) || '.ex', NULL, NULL,
      |         50, 'sup' || CAST(r_regionkey AS VARCHAR),
      |         'SupabaseDatabase' FROM region
      |  UNION ALL
      |  SELECT 'db-n-' || CAST(r_regionkey AS VARCHAR), 'postgres',
      |         NULL, NULL, true,
      |         60, 'nlb' || CAST(r_regionkey AS VARCHAR),
      |         'NetlifyDatabaseBranch' FROM region),
      |winners AS MATERIALIZED (
      |  SELECT name, type, endpoint, port, encrypted, lbl FROM (
      |    SELECT *, row_number() OVER (PARTITION BY name ORDER BY prio, sid) AS rk
      |    FROM src) WHERE rk = 1),
      |links AS (SELECT s.name, count(*) AS n FROM src s
      |          JOIN winners w ON s.name = w.name GROUP BY s.name)
      |SELECT w.name, w.type, w.endpoint, w.port, w.encrypted,
      |  w.lbl AS _ont_source, CAST(l.n AS BIGINT) AS n_sources
      |FROM winners w JOIN links l ON w.name = l.name""".stripMargin
}
